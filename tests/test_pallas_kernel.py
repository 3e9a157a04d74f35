"""Pallas CMux-step kernel parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.ops import ntt, pallas_ntt, server

N = 256
P = 4
B = 4
K1 = 2


def _random_bsk(rng, n_in, levels):
    plan = ntt.make_plan(N, P)
    out = np.zeros((n_in, levels, K1, K1, P, N), dtype=np.uint32)
    for pi in range(P):
        out[..., pi, :] = rng.integers(0, int(plan.plans[pi].p),
                                       (n_in, levels, K1, K1, N), dtype=np.uint64).astype(np.uint32)
    return out, plan


def test_mont_mul32_matches_u64():
    rng = np.random.default_rng(0)
    plan = ntt.make_plan(N, P)
    p = plan.plans[0].p
    pinv = plan.plans[0].p_inv_neg32
    a = rng.integers(0, int(p), (8, 128), dtype=np.uint64)
    b = rng.integers(0, int(p), (8, 128), dtype=np.uint64)
    want = ntt.mont_mul(a, b, p, pinv, np)
    got = pallas_ntt.mont_mul32(jnp.asarray(a.astype(np.uint32)),
                                jnp.asarray(b.astype(np.uint32)),
                                np.uint32(int(p)), np.uint32(int(pinv)))
    assert np.array_equal(np.asarray(got).astype(np.uint64), want)


def test_cmux_step_parity_interpret():
    rng = np.random.default_rng(7)
    n_in = 3
    levels = 1
    base_log = 23
    bsk, plan = _random_bsk(rng, n_in, levels)
    lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64) * 2 + 1
    mask = rng.integers(0, 2 * N, (B, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (B,), dtype=np.uint64)

    want = server.blind_rotate(jnp.asarray(mask), jnp.asarray(body),
                               jnp.asarray(lut), jnp.asarray(bsk), plan,
                               base_log, levels)
    got = server.blind_rotate_pallas(jnp.asarray(mask), jnp.asarray(body),
                                     jnp.asarray(lut), jnp.asarray(bsk), plan,
                                     base_log, levels, tb=2, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_cmux_step_parity_two_levels():
    rng = np.random.default_rng(8)
    n_in = 2
    levels = 2
    base_log = 8
    bsk, plan = _random_bsk(rng, n_in, levels)
    lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64)
    mask = rng.integers(0, 2 * N, (B, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (B,), dtype=np.uint64)
    want = server.blind_rotate(jnp.asarray(mask), jnp.asarray(body),
                               jnp.asarray(lut), jnp.asarray(bsk), plan,
                               base_log, levels)
    got = server.blind_rotate_pallas(jnp.asarray(mask), jnp.asarray(body),
                                     jnp.asarray(lut), jnp.asarray(bsk), plan,
                                     base_log, levels, tb=4, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_blind_rotate_v2_parity_interpret():
    """The PRODUCTION chunk-layout kernel (build_blind_rotate_v2) vs the XLA
    path, through the Pallas interpreter — the v2 kernel itself is what
    bench.py runs on hardware."""
    rng = np.random.default_rng(11)
    n_in, levels, base_log, b, tb = 3, 1, 23, 4, 2
    bsk, plan = _random_bsk(rng, n_in, levels)
    lut = rng.integers(0, 2**63, (b, K1, N), dtype=np.uint64) * 2 + 1
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)

    want = server.blind_rotate(jnp.asarray(mask), jnp.asarray(body),
                               jnp.asarray(lut), jnp.asarray(bsk), plan,
                               base_log, levels)
    got = server.blind_rotate_pallas_v2(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk), plan, base_log, levels, tb=tb, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_blind_rotate_v2_parity_interpret_two_levels():
    rng = np.random.default_rng(12)
    n_in, levels, base_log, b, tb = 2, 2, 8, 8, 4
    bsk, plan = _random_bsk(rng, n_in, levels)
    lut = rng.integers(0, 2**63, (b, K1, N), dtype=np.uint64)
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    want = server.blind_rotate(jnp.asarray(mask), jnp.asarray(body),
                               jnp.asarray(lut), jnp.asarray(bsk), plan,
                               base_log, levels)
    got = server.blind_rotate_pallas_v2(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk), plan, base_log, levels, tb=tb, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_blind_rotate_v2q_parity_interpret():
    """The u128 quad-word kernel (build_blind_rotate_v2q, PBS128/noise
    squashing) vs the XLA server128 path, bit-exact through the interpreter."""
    from tfhe_tpu.ops import server128

    rng = np.random.default_rng(13)
    n_in, levels, base_log, b, tb = 3, 3, 24, 4, 2
    p6 = 6
    plan = ntt.make_plan(N, p6)
    bsk = np.zeros((n_in, levels, K1, K1, p6, N), dtype=np.uint32)
    for pi in range(p6):
        bsk[..., pi, :] = rng.integers(
            0, int(plan.plans[pi].p), (n_in, levels, K1, K1, N),
            dtype=np.uint64).astype(np.uint32)
    lut_lo = rng.integers(0, 2**64, (b, K1, N), dtype=np.uint64)
    lut_hi = rng.integers(0, 2**63, (b, K1, N), dtype=np.uint64)
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)

    want_lo, want_hi = server128.blind_rotate128(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut_lo),
        jnp.asarray(lut_hi), jnp.asarray(bsk), plan, base_log, levels)
    got_lo, got_hi = server128.blind_rotate128_pallas(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut_lo),
        jnp.asarray(lut_hi), jnp.asarray(bsk), plan, base_log, levels,
        tb=tb, interpret=True)
    assert np.array_equal(np.asarray(got_lo), np.asarray(want_lo))
    assert np.array_equal(np.asarray(got_hi), np.asarray(want_hi))


def test_decompose128q_matches_server128():
    """Quad-word signed decomposition vs signed_decompose128 on random u128."""
    from tfhe_tpu.ops import server128

    rng = np.random.default_rng(14)
    lo = rng.integers(0, 2**64, (4, 128), dtype=np.uint64)
    hi = rng.integers(0, 2**64, (4, 128), dtype=np.uint64)
    for base_log, levels in ((24, 3), (12, 3), (23, 4), (31, 3)):
        want = server128.signed_decompose128(jnp.asarray(lo), jnp.asarray(hi),
                                             base_log, levels)
        m32 = np.uint64(0xFFFFFFFF)
        w = [jnp.asarray((lo & m32).astype(np.uint32)),
             jnp.asarray((lo >> np.uint64(32)).astype(np.uint32)),
             jnp.asarray((hi & m32).astype(np.uint32)),
             jnp.asarray((hi >> np.uint64(32)).astype(np.uint32))]
        got = pallas_ntt._decompose128q(w, base_log, levels)
        for (w_lo, _), g in zip(want, got):
            # digits are sign-wrapped; compare low 32 bits (|d| < 2^31)
            assert np.array_equal(np.asarray(w_lo).astype(np.uint32),
                                  np.asarray(g))
