"""Native BLS12-446 core (native/bls446.cpp) vs the pure-Python curve:
bit-exact agreement on scalar muls, Pippenger MSM, and fixed-base power
chains — the analog of the reference's curve_446 unit tests + the GPU-MSM
vs CPU-MSM cross-checks (tfhe-zk-pok/src/curve_api/msm.rs)."""

import random

import pytest

import tfhe_tpu.zk.curve446 as cv

pytestmark = pytest.mark.skipif(cv._NATIVE is None,
                                reason="native bls446 library not built")


def _py_g1_mul(p, k):
    k %= cv.R
    out = None
    add = cv._j_from_affine(p)
    while k:
        if k & 1:
            out = cv._j_add(out, add)
        add = cv._j_dbl(add)
        k >>= 1
    return cv._j_to_affine(out)


def _py_g2_mul(p, k):
    k %= cv.R
    out = None
    add = None if p is None else (p[0], p[1], cv.F2_ONE)
    while k:
        if k & 1:
            out = cv._j2_add(out, add)
        add = cv._j2_dbl(add)
        k >>= 1
    return cv._j2_to_affine(out)


def _py_msm_g1(points, scalars):
    jac = [cv._j_from_affine(p) for p in points]
    return cv._j_to_affine(cv._msm(jac, scalars, cv._j_add, None))


def _py_msm_g2(points, scalars):
    jac = [None if p is None else (p[0], p[1], cv.F2_ONE) for p in points]
    return cv._j2_to_affine(cv._msm(jac, scalars, cv._j2_add, None))


def test_scalar_mul_matches_python():
    rng = random.Random(11)
    for _ in range(4):
        k = rng.randrange(cv.R)
        assert cv.g1_mul(cv.G1_GEN, k) == _py_g1_mul(cv.G1_GEN, k)
        assert cv.g2_mul(cv.G2_GEN, k) == _py_g2_mul(cv.G2_GEN, k)


def test_scalar_mul_edge_cases():
    for k in (0, 1, 2, cv.R - 1, cv.R, cv.R + 3):
        assert cv.g1_mul(cv.G1_GEN, k) == _py_g1_mul(cv.G1_GEN, k), k
    # infinity input
    assert cv.g1_mul(None, 5) is None
    assert cv.g2_mul(None, 5) is None


def test_msm_matches_python():
    rng = random.Random(12)
    pts = [_py_g1_mul(cv.G1_GEN, rng.randrange(cv.R)) for _ in range(33)]
    pts[5] = None  # infinity inside the list
    scs = [rng.randrange(cv.R) for _ in range(33)]
    scs[2] = 0  # zero scalar
    assert cv.msm_g1(pts, scs) == _py_msm_g1(pts, scs)
    pts2 = [_py_g2_mul(cv.G2_GEN, rng.randrange(cv.R)) for _ in range(9)]
    scs2 = [rng.randrange(cv.R) for _ in range(9)]
    assert cv.msm_g2(pts2, scs2) == _py_msm_g2(pts2, scs2)


def test_powers_match_python():
    rng = random.Random(13)
    alpha = rng.randrange(1, cv.R)
    got = cv.g1_powers(cv.G1_GEN, alpha, 16, skip=7)
    cur = alpha
    for i in range(16):
        expect = None if i == 7 else _py_g1_mul(cv.G1_GEN, cur)
        assert got[i] == expect, i
        cur = cur * alpha % cv.R
    got2 = cv.g2_powers(cv.G2_GEN, alpha, 6)
    cur = alpha
    for i in range(6):
        assert got2[i] == _py_g2_mul(cv.G2_GEN, cur), i
        cur = cur * alpha % cv.R


def test_msm_results_on_curve():
    rng = random.Random(14)
    pts = [_py_g1_mul(cv.G1_GEN, rng.randrange(cv.R)) for _ in range(8)]
    scs = [rng.randrange(cv.R) for _ in range(8)]
    out = cv.msm_g1(pts, scs)
    assert cv.g1_is_on_curve(out)
    out2 = cv.msm_g2([_py_g2_mul(cv.G2_GEN, 3), _py_g2_mul(cv.G2_GEN, 9)],
                     [rng.randrange(cv.R) for _ in range(2)])
    assert cv.g2_is_on_curve(out2)


def test_native_pairing_matches_python():
    """Full native pairing (Fp6/Fp12 towers + Miller + final exp) vs the
    pure-Python tower, plus bilinearity."""
    from tfhe_tpu.zk import curve446 as cv

    if cv._NATIVE is None or not getattr(cv._NATIVE, "_has_pairing", False):
        import pytest
        pytest.skip("native pairing not built")
    p, q = cv.G1_GEN, cv.G2_GEN
    e_native = cv.pairing(p, q)
    nat = cv._NATIVE
    try:
        cv._NATIVE = None
        e_py = cv.pairing(p, q)
    finally:
        cv._NATIVE = nat
    assert e_native == e_py
    # bilinearity: e(aP, bQ) == e(P, Q)^(ab)
    a, b = 7, 11
    lhs = cv.pairing(cv.g1_mul(p, a), cv.g2_mul(q, b))
    rhs = cv.f12_pow(e_native, a * b)
    assert lhs == rhs
    assert cv.pairing(None, q) == cv.F12_ONE


def test_native_pairing_product_matches_python_random_points():
    """The native Jacobian multi-Miller pairing_product (one shared final
    exponentiation) agrees with the pure-Python affine tower on RANDOM
    points — the affine fallback only triggers on exceptional inputs in
    production, so without this diff a regression in either path would
    pass CI (ADVICE r4)."""
    import random

    from tfhe_tpu.zk import curve446 as cv

    if cv._NATIVE is None or not getattr(cv._NATIVE,
                                         "_has_pairing_product", False):
        import pytest
        pytest.skip("native pairing_product not built")
    rng = random.Random(42)
    pairs = [(cv.g1_mul(cv.G1_GEN, rng.randrange(2, cv.R)),
              cv.g2_mul(cv.G2_GEN, rng.randrange(2, cv.R)))
             for _ in range(3)] + [(None, cv.G2_GEN)]
    got = cv.pairing_product(pairs)
    nat = cv._NATIVE
    try:
        cv._NATIVE = None
        want = cv.pairing_product(pairs)
    finally:
        cv._NATIVE = nat
    assert got == want


def test_a_theta_head_gmp_matches_numpy():
    """Kronecker-substitution (GMP) vs exact-int64-correlation (numpy)
    builds of the rot(a).T/rot(b).T head block (zk/pke.py) — the GMP path
    is the verifier's critical path and was previously untested against
    the numpy twin (ADVICE r4)."""
    import random

    from tfhe_tpu.zk import curve446 as cv
    from tfhe_tpu.zk import gmp_bigint as g
    from tfhe_tpu.zk import pke

    if not g.available():
        import pytest
        pytest.skip("libgmp not available")
    rng = random.Random(7)
    d, k = 64, 8
    theta1 = [rng.randrange(cv.R) for _ in range(d)]
    theta2 = [rng.randrange(cv.R) for _ in range(k - 1)]
    a = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(2 * d)]
    b = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(2 * d)]
    got = pke._a_theta_head_gmp(theta1, theta2, a, b, d, k)
    want = pke._a_theta_head_np(theta1, theta2, a, b, d, k)
    assert [x % cv.R for x in got] == [x % cv.R for x in want]
