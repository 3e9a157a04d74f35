"""v7 truncated-accumulator blind rotation: kernel parity with the XLA twin
(ops.mxu.blind_rotate_mxu_trunc), correctness through the full AP, and the
truncation noise term (per-step rounding of the external product to the
2^32 grid) measured against its closed form."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu, server as srv
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
    TUniform,
)

N = 512
N_IN = 4
K_GLWE = 1
BASE_LOG, LEVELS = 23, 1


@pytest.fixture(scope="module")
def setup():
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    bsk = kg.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)
    return bsk


def test_v7_kernel_parity_interpret(setup):
    """v7 kernel == blind_rotate_mxu_trunc, bit-exact (3-prime rounded)."""
    bsk = setup
    plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=15)
    m3, _ = mxu.bsk_to_mxu(bsk, plan3)
    v32, corr, _ = mxu.bsk_to_mxu_v5(bsk, plan3)
    rng = np.random.default_rng(21)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    # delta-aligned LUT (low word zero), like real accumulators
    lut = (rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
           & np.uint64(0xFFFFFFFF00000000))
    want = np.asarray(mxu.blind_rotate_mxu_trunc(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m3), plan3, BASE_LOG, LEVELS))
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v5(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(v32), jnp.asarray(corr), plan3, BASE_LOG, LEVELS,
        tb=2, interpret=True, jfold=True, trunc_acc=True))
    assert (got & np.uint64(0xFFFFFFFF) == 0).all()
    assert (got == want).all()


def test_trunc_noise_term(setup):
    """Single-step isolation: trunc-vs-exact difference on identical inputs
    is the 2^32-grid rounding — variance 2^64/12 per coefficient."""
    bsk = setup
    plan4 = mxu.make_mxu_plan(N, num_primes=4)
    m4, _ = mxu.bsk_to_mxu(bsk, plan4)
    rng = np.random.default_rng(5)
    b = 16
    glwe = (rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
            & np.uint64(0xFFFFFFFF00000000))
    prod = np.asarray(mxu.external_product_mxu(
        jnp.asarray(glwe), jnp.asarray(m4[0]), plan4, BASE_LOG, LEVELS))
    rounded = (prod + np.uint64(1 << 31)) & np.uint64(0xFFFFFFFF00000000)
    err = (rounded - prod).astype(np.int64).astype(np.float64)
    want = 2.0 ** 64 / 12.0
    got = err.var()
    assert 0.9 * want < got < 1.1 * want, (got, want)
    assert abs(err.mean()) < 4 * math.sqrt(want / err.size)


def test_trunc_budget_production():
    """The per-step truncation costs ~2^78 of output variance at 2_2 —
    noise-floor dust vs the ~2^107.5 pfail budget."""
    from tfhe_tpu import shortint
    from tfhe_tpu.core import noise as nf

    p = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    per_step = 2.0 ** 64 / 12.0
    amp = 1.0 + p.glwe_dimension * p.polynomial_size / 2.0
    total = p.lwe_dimension * per_step * amp
    base = nf.pbs_output_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
        nf.distribution_variance(p.glwe_noise, p.bits), p.bits)
    assert total < 1e-5 * base, (math.log2(total), math.log2(base))


def test_v7_full_ap_decrypts():
    """End-to-end ks_pbs_batch_mxu(kernel=v7) at tuned small params."""
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.params import MsNoiseReduction, ShortintParams
    from tfhe_tpu.shortint.server_key import ServerKey

    p = ShortintParams(
        lwe_dimension=64, glwe_dimension=1, polynomial_size=256,
        lwe_noise=TUniform(3), glwe_noise=TUniform(3),
        pbs_base_log=23, pbs_level=1, ks_base_log=4, ks_level=4,
        message_modulus=4, carry_modulus=4, max_noise_level=5,
        log2_p_fail=-3.0, ms_noise_reduction=MsNoiseReduction.NONE)
    ck = ClientKey(p, seed=0x77)
    sk = ServerKey(ck, seed=0x77)
    plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=15)
    v32, corr, _ = mxu.bsk_to_mxu_v5(sk._bsk_coeff, plan3)
    b = 8
    vals = [i % 4 for i in range(b)]
    cts = np.stack([np.asarray(ck.encrypt(v).data) for v in vals])
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % 16)
    lut_b = jnp.asarray(np.broadcast_to(
        np.asarray(lut.acc), (b,) + np.asarray(lut.acc).shape))
    out = np.asarray(srv.ks_pbs_batch_mxu(
        jnp.asarray(cts), lut_b, sk.ksk, jnp.asarray(v32), plan3,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level, p.bits,
        False, 2, kernel="v7", interpret=True, corr_mid=jnp.asarray(corr)))
    from tfhe_tpu.shortint.ciphertext import NOMINAL_NOISE, Ciphertext

    for i, v in enumerate(vals):
        dec = ck.decrypt_raw(Ciphertext(out[i], 15, NOMINAL_NOISE,
                                        p.message_modulus, p.carry_modulus))
        assert dec == (3 * v + 1) % 16
