"""Fused multi-bit PBS (v9 kernel, indicator pattern keys): semantics,
kernel parity, and the measured noise chain at the production shape.

Reference semantics: lwe_multi_bit_programmable_bootstrapping.rs:319-556
(one effective GGSW per group of g secret bits); the fused form is
documented in ops/mxu.py ("Multi-bit fusion" section).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg, multibit as mb, noise as nf
from tfhe_tpu.core.entities import LweBootstrapKey
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu as pm, server as srv
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
    TUniform,
)

N, N_IN, K, BASE_LOG, LEVELS = 512, 4, 1, 23, 1


@pytest.fixture(scope="module")
def mb_setup():
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    decomp = DecompParams(BASE_LOG, LEVELS)
    mbk = mb.generate_multibit_bootstrap_key(
        lwe_sk, glwe_sk, decomp, 2, TUniform(3), gen_e)
    plan = mxu.make_mxu_plan(N, num_primes=4)
    m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, 2)
    return lwe_sk, glwe_sk, decomp, mbk, plan, m_limbs


def _rot_poly(p, rr):
    """X^rr * p (negacyclic), p: (N,) u64."""
    idx = np.arange(p.shape[-1])
    n = p.shape[-1]
    src = (idx - rr) % n
    sign = ((idx - rr) // n) % 2
    return np.where(sign == 0, p[src], np.uint64(0) - p[src])


def _dec_glwe(glwe_sk, ct):
    """Phase polynomials of a batch of GLWE cts (binary key)."""
    n = ct.shape[-1]
    out = []
    for e in range(ct.shape[0]):
        acc = ct[e, -1].astype(np.uint64).copy()
        for j in range(ct.shape[1] - 1):
            skd = np.asarray(glwe_sk.data[j])
            conv = np.zeros(n, dtype=np.uint64)
            for i in np.nonzero(skd)[0]:
                conv += _rot_poly(ct[e, j].astype(np.uint64), int(i))
            acc -= conv
        out.append(acc)
    return np.stack(out)


def test_multibit_twin_semantics(mb_setup):
    """blind_rotate_mxu_multibit rotates by X^{sum a_i s_i - b} with noise
    far below the 2_2 delta (decomposition error ~2^45 at l=1/base 23)."""
    lwe_sk, glwe_sk, decomp, mbk, plan, m_limbs = mb_setup
    rng = np.random.default_rng(1)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K + 1, N), dtype=np.uint64)
    degrees = srv.multibit_switched_degrees(jnp.asarray(mask), 2,
                                            N.bit_length(), raw=False)
    got = np.asarray(mxu.blind_rotate_mxu_multibit(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, 2))
    s = np.asarray(lwe_sk.data, dtype=np.int64)
    rot = (-(body.astype(np.int64))
           + (mask.astype(np.int64) * s).sum(-1)) % (2 * N)
    ph_lut = _dec_glwe(glwe_sk, lut)
    ph_exp = np.stack([_rot_poly(ph_lut[e], int(rot[e]))
                       for e in range(b)])
    diff = (_dec_glwe(glwe_sk, got) - ph_exp).view(np.int64)
    assert np.abs(diff).max() < (1 << 48), np.log2(np.abs(diff).max())


@pytest.mark.parametrize("n_in,grouping,ss,nprimes", [
    (4, 2, 2, 4), (4, 4, 1, 4),
    # n_groups=3 with ss=2: padded tail macro group (the production g=2 set
    # has 459 groups -> 230 macro groups with one padded sub-step; a zeroed
    # tail group must be a no-op, not wipe the accumulator)
    (6, 2, 2, 4),
])
def test_v9_kernel_parity_interpret(mb_setup, n_in, grouping, ss, nprimes):
    """The v9 fused kernel is bit-exact vs the XLA twin (trunc mode, the
    production configuration) in interpret mode."""
    _, glwe_sk, decomp, _, _, _ = mb_setup
    gen_s = SecretRandomGenerator(321 + n_in)
    lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
    gen_e = EncryptionRandomGenerator(17, DeterministicSeeder(5))
    mbk = mb.generate_multibit_bootstrap_key(
        lwe_sk, glwe_sk, decomp, grouping, TUniform(3), gen_e)
    plan = mxu.make_mxu_plan(N, num_primes=nprimes)
    m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, grouping)
    bhat = mxu.multibit_eval_domain(mbk, decomp, plan, grouping)
    v32, corr = mxu.middle_v9_from_eval_device(
        jnp.asarray(bhat), plan, BASE_LOG, grouping, ss=ss)
    rng = np.random.default_rng(2)
    b = 4
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = (rng.integers(0, 1 << 32, (b, K + 1, N), dtype=np.uint64)
           << np.uint64(32))
    degrees = srv.multibit_switched_degrees(jnp.asarray(mask), grouping,
                                            N.bit_length(), raw=False)
    want = np.asarray(mxu.blind_rotate_mxu_multibit(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, grouping, trunc=True))
    got = np.asarray(pm.blind_rotate_pallas_v9(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        v32, corr, plan, BASE_LOG, LEVELS, grouping, tb=4, interpret=True,
        trunc_acc=True, ss=ss))
    assert (got == want).all()


def test_v9_noise_chain_production_shape():
    """Measured BR output noise at the production-SHAPED fused config
    (N=2048, g=2, base 22, l=1, TUniform(17) key noise, rb=16 rounded
    pattern tensors; n scaled to 64 so the CPU twin is tractable — the
    formula is linear in n) vs multibit_pbs_output_variance.  Validates the
    2^g key term, the 2^g mask-floored rounding term, and the 1/g
    decomposition terms in one measurement."""
    import os

    n_in, g, n_poly, bl, rb = 64, 2, 2048, 22, 16
    gen_s = SecretRandomGenerator(31)
    lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(1, n_poly, gen_s)
    gen_e = EncryptionRandomGenerator(11, DeterministicSeeder(3))
    decomp = DecompParams(bl, 1)
    mbk = mb.generate_multibit_bootstrap_key(
        lwe_sk, glwe_sk, decomp, g, TUniform(17), gen_e)
    # keygen-side mask flooring (phase-preserving), as ServerKey does
    flat = LweBootstrapKey(mbk.reshape((-1,) + mbk.shape[2:]), decomp, 64)
    mbk_f = mxu.mask_floor_bsk(flat, glwe_sk, rb).data.reshape(mbk.shape)
    plan = mxu.make_mxu_plan(n_poly, num_primes=3, round_bits=rb)
    m_limbs = mxu.multibit_bsk_to_mxu(mbk_f, decomp, plan, g)

    n_s = int(os.environ.get("TFHE_TPU_NOISE_SAMPLES", "64"))
    rng = np.random.default_rng(5)
    # inputs: noiseless switched masks (uniform degrees); identity LUT
    mask = rng.integers(0, 2 * n_poly, (n_s, n_in), dtype=np.uint64)
    body = np.zeros(n_s, dtype=np.uint64)
    delta = np.uint64(1 << 59)
    box = np.repeat(np.arange(16, dtype=np.uint64) * delta, n_poly // 16)
    lut = np.broadcast_to(
        np.stack([np.zeros(n_poly, np.uint64), box]),
        (n_s, 2, n_poly)).copy()
    degrees = srv.multibit_switched_degrees(jnp.asarray(mask), g,
                                            n_poly.bit_length(), raw=False)
    acc = np.asarray(mxu.blind_rotate_mxu_multibit(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan, bl, 1, g))
    se = np.asarray(srv.sample_extract(jnp.asarray(acc)))
    big_sk = np.concatenate([np.asarray(glwe_sk.data[0])]).astype(np.uint64)
    phase = se[:, -1] - (se[:, :-1] * big_sk[None, :]).sum(
        axis=1, dtype=np.uint64)
    # subtract the encoded plaintext (the rotated box value)
    s = np.asarray(lwe_sk.data, dtype=np.int64)
    rot = ((mask.astype(np.int64) * s).sum(-1)) % (2 * n_poly)
    exp_pt = np.stack([_rot_poly(lut[e, 1], int(rot[e]))[0]
                       for e in range(n_s)])
    noise = (phase - exp_pt).view(np.int64).astype(np.float64)
    got = noise.var()
    want = nf.multibit_pbs_output_variance(
        n_in, g, 1, n_poly, bl, 1,
        nf.distribution_variance(TUniform(17), 64), 64,
        bsk_round_bits=rb, bsk_mask_floored=True)
    tol = 3.5 * math.sqrt(2.0 / n_s)
    assert (1 - tol) * want < got < (1 + tol) * want, (got, want, got / want)


def test_tpu_multibit_set_estimator_floored():
    """The TPU g=2 set stays on the estimator curves at the fused kernel's
    mask-floored effective modulus (2^(64-16))."""
    from tfhe_tpu.core import security as sec
    from tfhe_tpu.shortint import (
        TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
        as P,
    )
    from tfhe_tpu.shortint.server_key import _mxu_mb_round_bits

    rb = _mxu_mb_round_bits(P)
    assert rb == 16, rb
    kn = P.glwe_dimension * P.polynomial_size
    ok, detail = sec.check_lwe_noise_secure(P.glwe_noise, kn, P.bits,
                                            modulus_log2_shrink=rb)
    assert ok, detail


def test_tpu_multibit_set_pfail_model():
    """log2_p_fail recorded on the TPU g=2 set matches the analytic model
    (the same model reproduces the reference's published values for the
    GROUP_4 multibit and classic 2_2 sets within 1 bit)."""
    from tfhe_tpu.shortint import (
        TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
        as P,
    )

    var = 25.0 * nf.multibit_pbs_output_variance(
        P.lwe_dimension, P.grouping_factor, P.glwe_dimension,
        P.polynomial_size, P.pbs_base_log, P.pbs_level,
        nf.distribution_variance(P.glwe_noise, P.bits), P.bits,
        bsk_round_bits=16, bsk_mask_floored=True)
    var += nf.keyswitch_additive_variance(
        P.big_lwe_dimension, P.ks_base_log, P.ks_level,
        nf.distribution_variance(P.lwe_noise, P.bits), P.bits)
    var += nf.centered_ms_additive_variance(
        P.lwe_dimension, P.polynomial_size.bit_length(), P.bits)
    half_box = 2.0 ** P.bits / (2 * P.total_modulus) / 2.0
    x = half_box / math.sqrt(2.0 * var)
    log2_pfail = -x * x / math.log(2) - math.log2(x * math.sqrt(math.pi))
    assert abs(log2_pfail - P.log2_p_fail) < 1.0, (log2_pfail, P.log2_p_fail)
    assert log2_pfail < -128


@pytest.mark.parametrize("n_in,grouping,ss,nprimes", [
    (4, 2, 2, 4), (4, 4, 1, 4), (6, 2, 2, 4),
])
def test_v9g_kernel_parity_interpret(mb_setup, n_in, grouping, ss, nprimes):
    """The grid-scheduled v9g kernel (subset-major middle layout,
    per-pattern mid-dot accumulation) is bit-exact vs the XLA twin —
    including the padded-tail case (n_groups=3, ss=2)."""
    _, glwe_sk, decomp, _, _, _ = mb_setup
    gen_s = SecretRandomGenerator(321 + n_in)
    lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
    gen_e = EncryptionRandomGenerator(17, DeterministicSeeder(5))
    mbk = mb.generate_multibit_bootstrap_key(
        lwe_sk, glwe_sk, decomp, grouping, TUniform(3), gen_e)
    plan = mxu.make_mxu_plan(N, num_primes=nprimes)
    m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, grouping)
    bhat = mxu.multibit_eval_domain(mbk, decomp, plan, grouping)
    v32, corr = mxu.middle_v9_from_eval_device(
        jnp.asarray(bhat), plan, BASE_LOG, grouping, ss=ss,
        subset_major=True)
    rng = np.random.default_rng(2)
    b = 4
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = (rng.integers(0, 1 << 32, (b, K + 1, N), dtype=np.uint64)
           << np.uint64(32))
    degrees = srv.multibit_switched_degrees(jnp.asarray(mask), grouping,
                                            N.bit_length(), raw=False)
    want = np.asarray(mxu.blind_rotate_mxu_multibit(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, grouping, trunc=True))
    got = np.asarray(pm.blind_rotate_pallas_v9g(
        degrees, jnp.asarray(body), jnp.asarray(lut),
        v32, corr, plan, BASE_LOG, LEVELS, grouping, tb=4, interpret=True,
        ss=ss))
    assert (got == want).all()
