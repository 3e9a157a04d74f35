"""CRT-NTT engine tests: roundtrip, exactness vs schoolbook oracle, jnp parity."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ops import ntt
from tfhe_tpu.ops.polymul_ref import negacyclic_polymul_exact

rng = np.random.default_rng(42)


def test_plan_roots():
    plan = ntt.make_plan(256)
    for i, p in enumerate(plan.primes):
        pp = plan.plans[i]
        assert (int(p) - 1) % 512 == 0
        assert int(pp.p) == p


def test_ntt_roundtrip_numpy():
    plan = ntt.make_plan(128)
    for i in range(plan.num_primes):
        p = int(plan.plans[i].p)
        x = rng.integers(0, p, size=(3, 128), dtype=np.uint64)
        y = ntt.ntt_forward(x.copy(), plan, i, np)
        z = ntt.ntt_inverse(y, plan, i, np)
        assert np.array_equal(z, x)


def test_ntt_negacyclic_convolution_theorem():
    # pointwise product in NTT domain == negacyclic convolution mod p
    plan = ntt.make_plan(64)
    i = 0
    p = int(plan.plans[i].p)
    a = rng.integers(0, p, size=64, dtype=np.uint64)
    b = rng.integers(0, p, size=64, dtype=np.uint64)
    fa = ntt.ntt_forward(a.copy(), plan, i, np)
    fb = ntt.ntt_forward(b.copy(), plan, i, np)
    fb_m = ntt.mont_mul(fb, ntt.mont_mul(fb * 0 + 1, plan.plans[i].r2, plan.plans[i].p, plan.plans[i].p_inv_neg32, np) * 0 + plan.plans[i].r2, plan.plans[i].p, plan.plans[i].p_inv_neg32, np)
    prod = ntt.mont_mul(fa, fb_m, plan.plans[i].p, plan.plans[i].p_inv_neg32, np)
    got = ntt.ntt_inverse(prod, plan, i, np)
    # oracle mod p
    n = 64
    out = np.zeros(n, dtype=object)
    for ii in range(n):
        for jj in range(n):
            k = ii + jj
            s = int(a[ii]) * int(b[jj])
            if k < n:
                out[k] += s
            else:
                out[k - n] -= s
    want = np.array([x % p for x in out], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_polymul_u64_vs_oracle():
    plan = ntt.make_plan(64)
    # binary b (keygen case): a full u64, b binary
    a = rng.integers(0, 1 << 63, size=64, dtype=np.uint64) * 2 + rng.integers(0, 2, size=64, dtype=np.uint64)
    b = rng.integers(0, 2, size=64, dtype=np.uint64)
    got = ntt.negacyclic_polymul_u64(a, b, plan, np)
    want = negacyclic_polymul_exact(a, b)
    assert np.array_equal(got, want)


def test_polymul_small_digits_case():
    # external-product case: small unsigned digits times full-torus keys
    plan = ntt.make_plan(128)
    digits = rng.integers(0, 1 << 24, size=128, dtype=np.uint64)
    key = rng.integers(0, 1 << 63, size=128, dtype=np.uint64) * 2 + 1
    got = ntt.negacyclic_polymul_u64(digits, key, plan, np)
    want = negacyclic_polymul_exact(digits, key)
    assert np.array_equal(got, want)


def test_jnp_matches_numpy():
    plan = ntt.make_plan(256)
    a = rng.integers(0, 1 << 24, size=(2, 256), dtype=np.uint64)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=(2, 256), dtype=np.uint64)
    got_np = ntt.negacyclic_polymul_u64(a, b, plan, np)
    got_jnp = np.asarray(ntt.negacyclic_polymul_u64(jnp.asarray(a), jnp.asarray(b), plan, jnp))
    assert np.array_equal(got_np, got_jnp)


def test_garner_reconstruction():
    plan = ntt.make_plan(64)
    vals = [0, 1, 2**64 - 1, 2**95 + 12345, 2**99 + 987654321, 3**50]
    res = np.zeros((len(vals), plan.num_primes, 1), dtype=np.uint64)
    for vi, v in enumerate(vals):
        for i, p in enumerate(plan.primes):
            res[vi, i, 0] = v % p
    got = ntt.garner_to_u64(res, plan, np)
    want = np.array([[v % 2**64] for v in vals], dtype=np.uint64)
    assert np.array_equal(got, want)
