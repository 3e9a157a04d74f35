"""MXU-factorized external product / blind rotation vs the reference NTT
path (ops/mxu.py vs ops/server.py) — bit-exactness on small parameters."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.params import (
    BootstrapParams, CiphertextModulus, DecompParams, GlweParams, LweParams,
)
from tfhe_tpu.ops import mxu, ntt, server as srv
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
    TUniform,
)

N = 512
N_IN = 4
K_GLWE = 1
BASE_LOG, LEVELS = 23, 1


def _rebuild_bsk():
    """Deterministically rebuild the fixture's bsk (same seeds)."""
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    return kg.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)


@pytest.fixture(scope="module")
def setup():
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    bsk = kg.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)
    bsk_mont, plan_ref = kg.bootstrap_key_to_ntt(bsk)
    m_limbs, plan_mxu = mxu.bsk_to_mxu(bsk)
    return bsk_mont, plan_ref, m_limbs, plan_mxu


def test_external_product_matches(setup):
    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    rng = np.random.default_rng(0)
    glwe = rng.integers(0, 1 << 64, (3, K_GLWE + 1, N), dtype=np.uint64)
    ref = np.asarray(srv.external_product_ntt(
        jnp.asarray(glwe), jnp.asarray(bsk_mont[0]).astype(jnp.uint64),
        plan_ref, BASE_LOG, LEVELS))
    got = np.asarray(mxu.external_product_mxu(
        jnp.asarray(glwe), m_limbs[0], plan_mxu, BASE_LOG, LEVELS))
    assert (got == ref).all(), f"max diff {np.max(got - ref)}"


def test_blind_rotate_matches(setup):
    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    rng = np.random.default_rng(1)
    b = 3
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    ref = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    got = np.asarray(mxu.blind_rotate_mxu(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan_mxu, BASE_LOG, LEVELS))
    assert (got == ref).all()


def test_mxu_prime_pool():
    import math
    for p, (a, m) in zip(mxu.MXU_PRIMES, ((1, 16), (9, 13), (5, 15), (3, 16))):
        assert p == (1 << 28) - a * (1 << m) + 1
        assert (p - 1) % (2 * 4096) == 0  # supports N <= 4096
    prod = math.prod(mxu.MXU_PRIMES)
    # exact-product bound for the classic families (l*(k+1)*N*B/2*2^63 * 2)
    assert prod > 2 * 1 * 2 * 2048 * (1 << 22) * (1 << 63)


def test_v3_kernel_parity_interpret(setup):
    """The fused v3 Pallas kernel (pallas_mxu) vs the XLA MXU path —
    bit-exact through the interpreter."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    rng = np.random.default_rng(5)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v3(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan_mxu, BASE_LOG, LEVELS, tb=2,
        interpret=True))
    assert (got == want).all()


def test_v4_kernel_parity_interpret(setup):
    """The aligned-layout v4 Pallas kernel vs the XLA reference path —
    bit-exact through the interpreter (4- and 3-prime fold modes)."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    rng = np.random.default_rng(6)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    # redc mode needs the middle matrix Montgomery-scaled (mont=True build)
    bsk = _rebuild_bsk()
    m_mont, _ = mxu.bsk_to_mxu(bsk, mont=True)
    for fold_mode, ml in (("solinas", m_limbs), ("mont", m_limbs),
                          ("redc", m_mont)):
        mt = jnp.asarray(mxu.transpose_middle(ml))
        got = np.asarray(pallas_mxu.blind_rotate_pallas_v4(
            jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
            mt, plan_mxu, BASE_LOG, LEVELS, tb=2, interpret=True,
            fold_mode=fold_mode))
        assert (got == want).all(), fold_mode


def test_v3_redc_parity_interpret(setup):
    """v3 with the REDC-domain fold + mont-scaled middle matrix vs the
    reference — covers the fold mode bench.py uses on hardware."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    m_mont, _ = mxu.bsk_to_mxu(_rebuild_bsk(), mont=True)
    rng = np.random.default_rng(7)
    b = 2
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v3(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_mont), plan_mxu, BASE_LOG, LEVELS, tb=2,
        interpret=True, fold_mode="redc"))
    assert (got == want).all()


def test_three_prime_rounded_bsk_parity(setup):
    """3-prime MXU mode: BSK rounded to multiples of 2^15 shrinks the CRT
    bound so three 28-bit primes reconstruct exactly.  The XLA reference NTT
    path on the SAME rounded key must match bit-for-bit, and the fused v3
    kernel must match the XLA MXU path."""
    from tfhe_tpu.core import keygen as kgx
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.ops import pallas_mxu
    from tfhe_tpu.utils.csprng import (
        DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
        TUniform)

    gen_s = SecretRandomGenerator(123)
    lwe_sk = kgx.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kgx.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    bsk = kgx.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)
    rb = 15
    bsk_r = mxu.round_bsk(bsk, rb)
    assert (np.asarray(bsk_r.data) & ((1 << rb) - 1) == 0).all()
    plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=rb)
    m3, _ = mxu.bsk_to_mxu(bsk, plan3)
    bsk_mont_r, plan_ref = kgx.bootstrap_key_to_ntt(bsk_r)

    rng = np.random.default_rng(9)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont_r).astype(jnp.uint64), plan_ref,
        BASE_LOG, LEVELS))
    got_xla = np.asarray(mxu.blind_rotate_mxu(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m3), plan3, BASE_LOG, LEVELS))
    assert (got_xla == want).all()
    got_v3 = np.asarray(pallas_mxu.blind_rotate_pallas_v3(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m3), plan3, BASE_LOG, LEVELS, tb=2, interpret=True,
        fold_mode="solinas"))
    assert (got_v3 == want).all()
    # the device middle build agrees with the host build in 3-prime mode
    bhat3, _ = mxu.bsk_eval_domain(bsk, plan3)
    dev3 = np.asarray(mxu.middle_from_eval_device(jnp.asarray(bhat3), plan3))
    assert (dev3 == m3).all()


def test_crt_bound_guard():
    """3-prime mode without rounding must be rejected (bound too large)."""
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.core.entities import LweBootstrapKey

    plan3 = mxu.make_mxu_plan(2048, num_primes=3)
    fake = LweBootstrapKey(np.zeros((1, 1, 2, 2, 2048), np.uint64),
                           DecompParams(23, 1), 64)
    with pytest.raises(AssertionError):
        mxu.assert_crt_bound(fake, plan3, 0)
    mxu.assert_crt_bound(fake, plan3, 15)   # rounded: fits


def test_device_middle_build_matches_host(setup):
    """bsk_eval_domain + middle_from_eval_device == bsk_to_mxu."""
    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    import tfhe_tpu.core.keygen as kg2  # noqa: F401  (setup already built bsk)
    # rebuild the bsk deterministically (same seeds as the fixture)
    from tfhe_tpu.core import keygen as kgx
    from tfhe_tpu.utils.csprng import (
        DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
        TUniform)
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kgx.generate_binary_lwe_secret_key(N_IN, gen_s)
    glwe_sk = kgx.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    from tfhe_tpu.core.params import DecompParams
    bsk = kgx.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)
    bhat, plan2 = mxu.bsk_eval_domain(bsk)
    dev = np.asarray(mxu.middle_from_eval_device(jnp.asarray(bhat), plan2))
    assert dev.shape == m_limbs.shape
    assert (dev == m_limbs).all()


def test_v5_kernel_parity_interpret(setup):
    """The byte-limb v5 Pallas kernel vs the XLA reference path —
    bit-exact through the interpreter (4-prime and 3-prime modes)."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    bsk = _rebuild_bsk()
    rng = np.random.default_rng(11)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    m8, corr, _ = mxu.bsk_to_mxu_v5(bsk, plan_mxu)
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v5(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m8), jnp.asarray(corr), plan_mxu, BASE_LOG, LEVELS,
        tb=2, interpret=True))
    assert (got == want).all()

    # 3-prime rounded-BSK mode
    plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=15)
    m8_3, corr3, _ = mxu.bsk_to_mxu_v5(bsk, plan3)
    bsk_r = mxu.round_bsk(bsk, 15)
    bsk_mont_r, plan_ref_r = kg.bootstrap_key_to_ntt(bsk_r)
    want3 = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont_r).astype(jnp.uint64), plan_ref_r,
        BASE_LOG, LEVELS))
    got3 = np.asarray(pallas_mxu.blind_rotate_pallas_v5(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m8_3), jnp.asarray(corr3), plan3, BASE_LOG, LEVELS,
        tb=2, interpret=True))
    assert (got3 == want3).all()


def test_v6_jfold_kernel_parity_interpret(setup):
    """The v6 (jfold) kernel — weight-premultiplied stage tables — vs the
    XLA reference path: bit-exact, 4-prime and 3-prime rounded modes."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    bsk = _rebuild_bsk()
    rng = np.random.default_rng(13)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    m8, corr, _ = mxu.bsk_to_mxu_v5(bsk, plan_mxu)
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v5(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m8), jnp.asarray(corr), plan_mxu, BASE_LOG, LEVELS,
        tb=2, interpret=True, jfold=True))
    assert (got == want).all()

    plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=15)
    m8_3, corr3, _ = mxu.bsk_to_mxu_v5(bsk, plan3)
    bsk_r = mxu.round_bsk(bsk, 15)
    bsk_mont_r, plan_ref_r = kg.bootstrap_key_to_ntt(bsk_r)
    want3 = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont_r).astype(jnp.uint64), plan_ref_r,
        BASE_LOG, LEVELS))
    got3 = np.asarray(pallas_mxu.blind_rotate_pallas_v5(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m8_3), jnp.asarray(corr3), plan3, BASE_LOG, LEVELS,
        tb=2, interpret=True, jfold=True))
    assert (got3 == want3).all()


def test_pbs_from_switched_mxu_parity(setup):
    """The decompression fast path (pbs_from_switched_batch_mxu) equals the
    XLA pbs_from_switched_batch, bit-exact in interpret mode."""
    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    bsk = _rebuild_bsk()
    v32, corr, _ = mxu.bsk_to_mxu_v5(bsk, plan_mxu)
    rng = np.random.default_rng(31)
    b = 4
    msed = rng.integers(0, 2 * N, (b, N_IN + 1), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    want = np.asarray(srv.pbs_from_switched_batch(
        jnp.asarray(msed), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref,
        BASE_LOG, LEVELS))
    got = np.asarray(srv.pbs_from_switched_batch_mxu(
        jnp.asarray(msed), jnp.asarray(lut), jnp.asarray(v32),
        jnp.asarray(corr), plan_mxu, BASE_LOG, LEVELS, tb=2,
        kernel="v6", interpret=True))
    assert (got == want).all()


def test_v8_kernel_parity_interpret(setup):
    """The v8 macro-step kernel (deferred s1 assembly, REDC inverse,
    ss-packed key blocks) vs the XLA reference path — bit-exact, non-trunc
    and trunc modes, 4-prime and 3-prime rounded, ss covering a padded
    tail (N_IN=4 with ss=4 and ss=2... ss must divide 128)."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    bsk = _rebuild_bsk()
    rng = np.random.default_rng(17)
    b = 4
    mask = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)

    # 4-prime exact, non-trunc, ss=4 (N_IN=4: one full macro step)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))
    v32, corr, _ = mxu.bsk_to_mxu_v8(bsk, plan_mxu, BASE_LOG, ss=4)
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v8(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(v32), jnp.asarray(corr), plan_mxu, BASE_LOG, LEVELS,
        tb=2, interpret=True, trunc_acc=False, ss=4))
    assert (got == want).all()

    # 3-prime rounded + trunc accumulator, ss=2 (two macro steps)
    plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=15)
    v32_3, corr3, _ = mxu.bsk_to_mxu_v8(bsk, plan3, BASE_LOG, ss=2)
    want3 = np.asarray(mxu.blind_rotate_mxu_trunc(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        mxu.bsk_to_mxu(bsk, plan3)[0], plan3, BASE_LOG, LEVELS))
    got3 = np.asarray(pallas_mxu.blind_rotate_pallas_v8(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(v32_3), jnp.asarray(corr3), plan3, BASE_LOG, LEVELS,
        tb=2, interpret=True, trunc_acc=True, ss=2))
    assert (got3 == want3).all()


def test_v8_padded_tail_noop(setup):
    """A non-ss-divisible step count: the zero-padded tail sub-steps must be
    exact no-ops (N_IN=4 data consumed through a 3-step prefix + v8 at
    ss=4 padding one dummy step... emulate by slicing to 3 steps)."""
    from tfhe_tpu.ops import pallas_mxu

    bsk_mont, plan_ref, m_limbs, plan_mxu = setup
    bsk = _rebuild_bsk()
    from tfhe_tpu.core.entities import LweBootstrapKey
    bsk3 = LweBootstrapKey(bsk.data[:3], bsk.decomp, bsk.bits)
    rng = np.random.default_rng(19)
    b = 2
    mask = rng.integers(0, 2 * N, (b, 3), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
    bsk_mont3, plan_ref3 = kg.bootstrap_key_to_ntt(bsk3)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont3).astype(jnp.uint64), plan_ref3,
        BASE_LOG, LEVELS))
    v32, corr, _ = mxu.bsk_to_mxu_v8(bsk3, plan_mxu, BASE_LOG, ss=4)
    assert v32.shape[0] == 1   # ceil(3/4): one macro step, one dummy tail
    got = np.asarray(pallas_mxu.blind_rotate_pallas_v8(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(v32), jnp.asarray(corr), plan_mxu, BASE_LOG, LEVELS,
        tb=2, interpret=True, trunc_acc=False, ss=4))
    assert (got == want).all()
