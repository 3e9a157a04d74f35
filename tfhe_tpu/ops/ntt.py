"""Exact negacyclic polynomial multiplication mod 2^64 via CRT-NTT.

This is the TPU-native replacement for the reference's FFT path
(tfhe/src/core_crypto/fft_impl/fft64/): TPUs have no f64 VPU, so instead of a
53-bit-mantissa approximate FFT we use an *exact* number-theoretic transform
over several 31-bit primes and reconstruct the product mod 2^64 with Garner's
algorithm.  Exactness means results are bit-identical to the reference's
deterministic Karatsuba path (karatsuba_pbs.rs) and platform-independent.

Design notes:
  - Primes p < 2^31 with 2^24 | p-1 (supports negacyclic sizes N <= 2^23).
  - Montgomery arithmetic (R = 2^32): all twiddles/constants are stored in
    Montgomery form, data stays in the normal domain; every mod-mul is one
    REDC32.  All intermediates fit in uint64 wrapping arithmetic, which both
    numpy and XLA:TPU (emulated 64-bit) implement exactly.
  - The same code runs under numpy (host keygen) and jax.numpy (device
    kernels) via the `xp` array-module parameter; JAX traces the static
    log2(N) stage loop into a fused kernel.

Digit-vs-key product bound (external product): unsigned digits <= B after the
half-base offset, keys < 2^64, accumulated over l*(k+1) polynomials of N
coefficients -> bound = l*(k+1) * N * B * 2^64.  The 4-prime product is
~2^123.6, covering every classic parameter set (e.g. 2_2: 2^99).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

# 31-bit NTT primes, p ≡ 1 (mod 2^24)
# NTT-friendly primes BELOW 2^30 (p - 1 divisible by 2^14, descending — the
# Garner reconstruction relies on p_0 < 2 * p_j).  Staying under 2^30 keeps
# 4p < 2^32, which unlocks Harvey-style lazy reduction in the Pallas
# butterflies (values travel < 4p, one conditional subtract per butterfly).
# First 4 cover exact u64 external products (120 bits > the 2^102 multibit
# bound); 6 cover u128 noise squashing (180 > 2^166); 8 cover the u128
# packing keyswitch (240 > 2^199).
PRIMES = (1073692673, 1073643521, 1073479681, 1073430529,
          1073299457, 1073233921, 1073184769, 1073135617)

_U64 = np.uint64
_MASK32 = _U64(0xFFFFFFFF)
_R_BITS = _U64(32)


def _pow_mod(base: int, exp: int, mod: int) -> int:
    return pow(base, exp, mod)


def _find_generator(p: int) -> int:
    # factorize p-1 (small numbers, trial division is fine)
    n = p - 1
    factors = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            factors.add(d)
            n //= d
        d += 1
    if n > 1:
        factors.add(n)
    for g in range(2, 1000):
        if all(_pow_mod(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise RuntimeError("no generator found")


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@dataclass(frozen=True, eq=False)
class PrimePlan:
    p: np.uint64
    p_inv_neg32: np.uint64   # -p^{-1} mod 2^32
    r2: np.uint64            # R^2 mod p (to enter Montgomery form)
    psi_br_mont: np.ndarray  # psi^bitrev table, Montgomery form, len N
    psi_inv_br_mont: np.ndarray
    n_inv_mont: np.ndarray   # N^{-1} * R mod p (scalar array)


@dataclass(frozen=True, eq=False)
class NttPlan:
    n: int
    primes: tuple
    plans: tuple  # tuple[PrimePlan]
    # stacked per-prime constants for the prime-vectorized kernels:
    ps: np.ndarray = None            # (P, 1) uint64
    pinvs: np.ndarray = None         # (P, 1)
    r2s: np.ndarray = None           # (P, 1)
    rs: np.ndarray = None            # (P, 1)  R mod p (for lazy-sum reduction)
    n_invs: np.ndarray = None        # (P, 1)
    psi_br_stack: np.ndarray = None  # (P, N)
    psi_inv_br_stack: np.ndarray = None

    @property
    def num_primes(self) -> int:
        return len(self.primes)


@lru_cache(maxsize=None)
def make_plan(n: int, num_primes: int = 4, primes: tuple = None) -> NttPlan:
    """Build an NTT plan.  `primes` overrides the default 30-bit pool (the
    MXU engine uses 28-bit pseudo-Fermat primes, ops/mxu.py); they must be
    descending with p0 < 2*p_j (Garner) and 2n | p-1."""
    assert n & (n - 1) == 0, "N must be a power of two"
    if primes is None:
        primes = PRIMES[:num_primes]
    else:
        primes = tuple(primes[:num_primes])
        assert all(primes[i] > primes[i + 1] for i in range(len(primes) - 1))
        assert primes[0] < 2 * primes[-1]
    plans = []
    for p in primes:
        assert (p - 1) % (2 * n) == 0, f"prime {p} does not support size {n}"
        g = _find_generator(p)
        psi = _pow_mod(g, (p - 1) // (2 * n), p)
        assert _pow_mod(psi, n, p) == p - 1
        psi_inv = _pow_mod(psi, p - 2, p)
        r = (1 << 32) % p
        r2 = (r * r) % p
        p_inv = pow(p, -1, 1 << 32)
        p_inv_neg32 = ((1 << 32) - p_inv) % (1 << 32)
        rev = _bitrev_indices(n)
        psi_pows = np.array([_pow_mod(psi, int(e), p) for e in range(n)], dtype=object)
        psi_inv_pows = np.array([_pow_mod(psi_inv, int(e), p) for e in range(n)], dtype=object)
        to_mont = lambda arr: np.array([(int(x) * r) % p for x in arr], dtype=np.uint64)
        psi_br = psi_pows[rev]
        psi_inv_br = psi_inv_pows[rev]
        n_inv = _pow_mod(n, p - 2, p)
        plans.append(
            PrimePlan(
                p=_U64(p),
                p_inv_neg32=_U64(p_inv_neg32),
                r2=_U64(r2),
                psi_br_mont=to_mont(psi_br),
                psi_inv_br_mont=to_mont(psi_inv_br),
                n_inv_mont=to_mont([n_inv]),
            )
        )
    return NttPlan(
        n=n, primes=primes, plans=tuple(plans),
        ps=np.stack([pp.p.reshape(1) for pp in plans]),
        pinvs=np.stack([pp.p_inv_neg32.reshape(1) for pp in plans]),
        r2s=np.stack([pp.r2.reshape(1) for pp in plans]),
        rs=np.stack([np.uint64((1 << 32) % p).reshape(1) for p in primes]),
        n_invs=np.stack([pp.n_inv_mont for pp in plans]),
        psi_br_stack=np.stack([pp.psi_br_mont for pp in plans]),
        psi_inv_br_stack=np.stack([pp.psi_inv_br_mont for pp in plans]),
    )


# ---------------------------------------------------------------------------
# Generic modular kernels (xp = numpy or jax.numpy)
# ---------------------------------------------------------------------------


def mont_mul(a, b_mont, p, p_inv_neg32, xp):
    """REDC32: returns a * b mod p given b in Montgomery form; result < p."""
    t = a * b_mont
    m = ((t & _MASK32) * p_inv_neg32) & _MASK32
    u = (t + m * p) >> _R_BITS
    return xp.where(u >= p, u - p, u)


def _add_mod(a, b, p, xp):
    s = a + b
    return xp.where(s >= p, s - p, s)


def _sub_mod(a, b, p, xp):
    d = a + p - b
    return xp.where(d >= p, d - p, d)


def ntt_forward(x, plan: NttPlan, prime_idx: int, xp):
    """Negacyclic forward NTT, natural order in -> bit-reversed out.

    x: uint64 array (..., N) with values < p.  Cooley-Tukey DIT with the
    psi-power twist merged into the twiddles (Longa-Naehrig style).
    """
    pp = plan.plans[prime_idx]
    p = pp.p
    pinv = pp.p_inv_neg32
    psi = xp.asarray(pp.psi_br_mont)
    n = plan.n
    batch_shape = x.shape[:-1]
    m = 1
    t = n
    while m < n:
        t //= 2
        xv = x.reshape(batch_shape + (m, 2, t))
        u = xv[..., 0, :]
        s = psi[m : 2 * m].reshape((1,) * len(batch_shape) + (m, 1))
        v = mont_mul(xv[..., 1, :], s, p, pinv, xp)
        x = xp.concatenate(
            [_add_mod(u, v, p, xp)[..., None, :], _sub_mod(u, v, p, xp)[..., None, :]],
            axis=-2,
        ).reshape(batch_shape + (n,))
        m *= 2
    return x


def ntt_inverse(x, plan: NttPlan, prime_idx: int, xp):
    """Negacyclic inverse NTT, bit-reversed in -> natural out (scaled by N^-1)."""
    pp = plan.plans[prime_idx]
    p = pp.p
    pinv = pp.p_inv_neg32
    psi_inv = xp.asarray(pp.psi_inv_br_mont)
    n = plan.n
    batch_shape = x.shape[:-1]
    t = 1
    m = n
    while m > 1:
        h = m // 2
        xv = x.reshape(batch_shape + (h, 2, t))
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        s = psi_inv[h : 2 * h].reshape((1,) * len(batch_shape) + (h, 1))
        lo = _add_mod(u, v, p, xp)
        hi = mont_mul(_sub_mod(u, v, p, xp), s, p, pinv, xp)
        x = xp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2).reshape(
            batch_shape + (n,)
        )
        t *= 2
        m = h
    n_inv = xp.asarray(pp.n_inv_mont)
    return mont_mul(x, n_inv, p, pinv, xp)


def to_residues(x, plan: NttPlan, xp):
    """uint64 (..., N) -> (..., num_primes, N) residues (normal domain)."""
    res = [x % plan.plans[i].p for i in range(plan.num_primes)]
    return xp.stack(res, axis=-2)


def forward_all(x, plan: NttPlan, xp):
    """(..., N) u64 -> (..., num_primes, N) NTT-domain residues (normal form)."""
    res = to_residues(x, plan, xp)
    outs = [
        ntt_forward(res[..., i, :], plan, i, xp) for i in range(plan.num_primes)
    ]
    return xp.stack(outs, axis=-2)


def forward_small(x, plan: NttPlan, xp):
    """Forward NTT of small unsigned values (< min prime): skips reduction."""
    outs = [ntt_forward(x, plan, i, xp) for i in range(plan.num_primes)]
    return xp.stack(outs, axis=-2)


def to_mont_all(x_ntt, plan: NttPlan, xp):
    """Convert NTT-domain residues (..., num_primes, N) to Montgomery form."""
    outs = []
    for i in range(plan.num_primes):
        pp = plan.plans[i]
        outs.append(mont_mul(x_ntt[..., i, :], pp.r2, pp.p, pp.p_inv_neg32, xp))
    return xp.stack(outs, axis=-2)


def pointwise_mul_mont(a_normal, b_mont, plan: NttPlan, xp):
    """(..., num_primes, N) x (..., num_primes, N in Montgomery) -> normal."""
    outs = []
    for i in range(plan.num_primes):
        pp = plan.plans[i]
        outs.append(mont_mul(a_normal[..., i, :], b_mont[..., i, :], pp.p, pp.p_inv_neg32, xp))
    return xp.stack(outs, axis=-2)


def add_mod_all(a, b, plan: NttPlan, xp):
    outs = [
        _add_mod(a[..., i, :], b[..., i, :], plan.plans[i].p, xp)
        for i in range(plan.num_primes)
    ]
    return xp.stack(outs, axis=-2)


def inverse_all(x_ntt, plan: NttPlan, xp):
    """(..., num_primes, N) NTT domain -> (..., num_primes, N) coefficients."""
    outs = [
        ntt_inverse(x_ntt[..., i, :], plan, i, xp) for i in range(plan.num_primes)
    ]
    return xp.stack(outs, axis=-2)


@lru_cache(maxsize=None)
def _garner_consts(primes: tuple):
    """Precompute Garner mixed-radix constants (Montgomery forms — the device
    reconstruction is division-free; `%` lowers to emulated u64 division on
    TPU and would dominate the external product)."""
    k = len(primes)
    consts = {}
    r = 1 << 32
    for j in range(1, k):
        pj = primes[j]
        prod = 1
        for i in range(j):
            prod = (prod * primes[i]) % pj
        inv = pow(prod, -1, pj)
        consts[f"inv_mont_{j}"] = _U64((inv * r) % pj)
    # partial products (p0..p_{i}) mod p_j in Montgomery form
    consts["pm_mont"] = {}
    for j in range(1, k):
        pj = primes[j]
        for i in range(j):
            prodi = 1
            for t in range(i + 1):
                prodi = (prodi * primes[t]) % pj
            consts["pm_mont"][(i, j)] = _U64((prodi * r) % pj)
    prods64 = []
    acc = 1
    for i in range(k):
        prods64.append(_U64(acc & 0xFFFFFFFFFFFFFFFF))
        acc *= primes[i]
    consts["prods64"] = prods64  # [1, p0, p0p1, p0p1p2] mod 2^64
    big_p = acc
    consts["P_mod64"] = _U64(big_p & 0xFFFFFFFFFFFFFFFF)
    # mixed-radix digits of floor(P/2) for the sign test (P is odd)
    half = big_p // 2
    half_digits = []
    for i in range(k):
        half_digits.append(_U64(half % primes[i]))
        half //= primes[i]
    consts["half_digits"] = half_digits
    # 128-bit variants (for the u128 torus of noise squashing): partial
    # products and P as (lo, hi) u64 pairs mod 2^128
    prods128 = []
    acc = 1
    for i in range(k):
        prods128.append((_U64(acc & 0xFFFFFFFFFFFFFFFF),
                         _U64((acc >> 64) & 0xFFFFFFFFFFFFFFFF)))
        acc *= primes[i]
    consts["prods128"] = prods128
    consts["P_mod128"] = (_U64(acc & 0xFFFFFFFFFFFFFFFF),
                          _U64((acc >> 64) & 0xFFFFFFFFFFFFFFFF))
    return consts


def garner_to_u64(residues, plan: NttPlan, xp):
    """CRT reconstruction mod 2^64 of a *signed* exact integer X.

    residues: (..., num_primes, N) holding X mod p_i for an integer X with
    |X| < P/2 (P = prod of primes); returns X mod 2^64 as uint64 (..., N).

    Garner's mixed-radix algorithm yields X mod P in [0, P); negative X land
    in (P/2, P).  The sign is recovered by comparing the mixed-radix digits
    against those of floor(P/2) lexicographically, then P mod 2^64 is
    subtracted (wrapping) for negative values.
    """
    primes = plan.primes
    k = len(primes)
    c = _garner_consts(primes)

    def cond_sub(x, p):
        return xp.where(x >= p, x - p, x)

    a = [residues[..., 0, :]]
    for j in range(1, k):
        pj = _U64(primes[j])
        pinv_j = plan.plans[j].p_inv_neg32
        # v = (a0 + a1*p0 + a2*p0p1 ...) mod pj, division-free:
        # a0 < p0 < 2*pj (primes are descending) -> one conditional subtract;
        # higher terms via Montgomery multiplies by precomputed constants.
        v = cond_sub(a[0], pj)
        for i in range(1, j):
            term = mont_mul(a[i], c["pm_mont"][(i - 1, j)], pj, pinv_j, xp)
            v = cond_sub(v + term, pj)
        r = residues[..., j, :]
        d = xp.where(r >= v, r - v, r + pj - v)
        aj = mont_mul(d, c["inv_mont_" + str(j)], pj, pinv_j, xp)
        a.append(aj)
    # X mod 2^64 = sum a_i * (p0..p_{i-1}) (wrapping)
    out = a[0]
    for i in range(1, k):
        out = out + a[i] * c["prods64"][i]
    # sign test: X_mod_P > floor(P/2)  (lexicographic over mixed-radix digits,
    # most significant digit a_{k-1} first)
    h = c["half_digits"]
    is_neg = a[0] > h[0]
    for i in range(1, k):
        is_neg = (a[i] > h[i]) | ((a[i] == h[i]) & is_neg)
    return xp.where(is_neg, out - c["P_mod64"], out)


# ---------------------------------------------------------------------------
# Prime-vectorized kernels: arrays carry a primes axis at position -2, all
# primes processed in one op stream (4x smaller HLO, better VPU vectorization)
# ---------------------------------------------------------------------------


def ntt_forward_stacked(x, plan: NttPlan, xp):
    """Forward negacyclic NTT over all primes at once.

    x: (..., P, N) uint64, values < p per prime lane; natural -> bit-reversed.
    """
    ps = xp.asarray(plan.ps)          # (P, 1)
    pinvs = xp.asarray(plan.pinvs)
    psi = xp.asarray(plan.psi_br_stack)  # (P, N)
    n = plan.n
    np_ = plan.num_primes
    batch_shape = x.shape[:-2]
    nb = len(batch_shape)
    m = 1
    t = n
    while m < n:
        t //= 2
        xv = x.reshape(batch_shape + (np_, m, 2, t))
        u = xv[..., 0, :]
        v_in = xv[..., 1, :]
        s = psi[:, m: 2 * m].reshape((1,) * nb + (np_, m, 1))
        p_b = ps.reshape((1,) * nb + (np_, 1, 1))
        pinv_b = pinvs.reshape((1,) * nb + (np_, 1, 1))
        v = mont_mul(v_in, s, p_b, pinv_b, xp)
        x = xp.concatenate(
            [_add_mod(u, v, p_b, xp)[..., None, :], _sub_mod(u, v, p_b, xp)[..., None, :]],
            axis=-2,
        ).reshape(batch_shape + (np_, n))
        m *= 2
    return x


def ntt_inverse_stacked(x, plan: NttPlan, xp):
    """Inverse negacyclic NTT over all primes; bit-reversed -> natural."""
    ps = xp.asarray(plan.ps)
    pinvs = xp.asarray(plan.pinvs)
    psi_inv = xp.asarray(plan.psi_inv_br_stack)
    n = plan.n
    np_ = plan.num_primes
    batch_shape = x.shape[:-2]
    nb = len(batch_shape)
    t = 1
    m = n
    while m > 1:
        h = m // 2
        xv = x.reshape(batch_shape + (np_, h, 2, t))
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        s = psi_inv[:, h: 2 * h].reshape((1,) * nb + (np_, h, 1))
        p_b = ps.reshape((1,) * nb + (np_, 1, 1))
        pinv_b = pinvs.reshape((1,) * nb + (np_, 1, 1))
        lo = _add_mod(u, v, p_b, xp)
        hi = mont_mul(_sub_mod(u, v, p_b, xp), s, p_b, pinv_b, xp)
        x = xp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2).reshape(
            batch_shape + (np_, n)
        )
        t *= 2
        m = h
    return mont_mul(x, xp.asarray(plan.n_invs), xp.asarray(plan.ps),
                    xp.asarray(plan.pinvs), xp)


def pointwise_mul_mont_stacked(a_normal, b_mont, plan: NttPlan, xp):
    """(..., P, N) x (..., P, N Montgomery) -> (..., P, N) normal domain."""
    return mont_mul(a_normal, b_mont, xp.asarray(plan.ps), xp.asarray(plan.pinvs), xp)


def add_mod_stacked(a, b, plan: NttPlan, xp):
    return _add_mod(a, b, xp.asarray(plan.ps), xp)


def lazy_reduce_stacked(x, plan: NttPlan, xp):
    """Reduce lazily-summed residues x < ~2^60 back below p per prime lane,
    division-free: y = REDC(x) = x*R^-1 mod p (valid for x < p*2^32), then
    one Montgomery multiply by R^2 restores x mod p."""
    ps = xp.asarray(plan.ps)
    pinvs = xp.asarray(plan.pinvs)
    one = _U64(1)
    y = mont_mul(x, one, ps, pinvs, xp)          # x * R^-1 mod p
    return mont_mul(y, xp.asarray(plan.r2s), ps, pinvs, xp)


def negacyclic_polymul_u64(a, b, plan: NttPlan, xp):
    """Exact negacyclic product mod 2^64.

    Correct when each output coefficient's exact integer value (using the
    unsigned u64 representatives of a and b) satisfies |X| < prod(primes)/2.
    Used by host keygen (binary secret keys: |X| <= N * 2^64 ~ 2^75 << P/2).
    """
    fa = forward_all(a, plan, xp)
    fb = forward_all(b, plan, xp)
    fb_m = to_mont_all(fb, plan, xp)
    prod = pointwise_mul_mont(fa, fb_m, plan, xp)
    coeffs = inverse_all(prod, plan, xp)
    return garner_to_u64(coeffs, plan, xp)


# ---------------------------------------------------------------------------
# u128 support: values travel as (lo, hi) u64 pairs (no u128 dtype on
# numpy/TPU).  Used by the noise-squashing PBS (fft128 analog — the reference
# uses split-double f64 arithmetic, fft_impl/fft128/; here the same exact
# CRT-NTT engine covers u128 with 6+ primes).
# ---------------------------------------------------------------------------


def add128(alo, ahi, blo, bhi, xp):
    lo = alo + blo
    carry = (lo < alo).astype(alo.dtype)
    return lo, ahi + bhi + carry


def sub128(alo, ahi, blo, bhi, xp):
    lo = alo - blo
    borrow = (alo < blo).astype(alo.dtype)
    return lo, ahi - bhi - borrow


def neg128(lo, hi, xp):
    zlo = xp.zeros_like(lo)
    return sub128(zlo, zlo, lo, hi, xp)


def mul_u32_by_u128(a, c_lo, c_hi, xp):
    """a (u64 array, values < 2^32) times constant pair (c_lo, c_hi) mod 2^128."""
    c_ll = _U64(int(c_lo) & 0xFFFFFFFF)
    c_lh = _U64(int(c_lo) >> 32)
    t0 = a * c_ll
    t1 = a * c_lh
    lo = t0 + ((t1 & _MASK32) << _R_BITS)
    carry = (lo < t0).astype(a.dtype)
    hi = (t1 >> _R_BITS) + a * _U64(c_hi) + carry
    return lo, hi


def to_residues_u128(lo, hi, plan: NttPlan, xp):
    """(lo, hi) u64 pairs (..., N) -> (..., num_primes, N) residues."""
    outs = []
    for i in range(plan.num_primes):
        p = plan.plans[i].p
        two64 = _U64((1 << 64) % int(p))
        r = ((hi % p) * two64 + lo % p) % p
        outs.append(r)
    return xp.stack(outs, axis=-2)


def forward_all_u128(lo, hi, plan: NttPlan, xp):
    res = to_residues_u128(lo, hi, plan, xp)
    outs = [ntt_forward(res[..., i, :], plan, i, xp) for i in range(plan.num_primes)]
    return xp.stack(outs, axis=-2)


def garner_to_u128(residues, plan: NttPlan, xp):
    """CRT reconstruction mod 2^128 of a signed exact integer (|X| < P/2).

    Same mixed-radix digits as garner_to_u64; accumulation and sign
    correction carried out on (lo, hi) u64 pairs.
    """
    primes = plan.primes
    k = len(primes)
    c = _garner_consts(primes)

    def cond_sub(x, p):
        return xp.where(x >= p, x - p, x)

    a = [residues[..., 0, :]]
    for j in range(1, k):
        pj = _U64(primes[j])
        pinv_j = plan.plans[j].p_inv_neg32
        v = cond_sub(a[0], pj)
        for i in range(1, j):
            term = mont_mul(a[i], c["pm_mont"][(i - 1, j)], pj, pinv_j, xp)
            v = cond_sub(v + term, pj)
        r = residues[..., j, :]
        d = xp.where(r >= v, r - v, r + pj - v)
        a.append(mont_mul(d, c["inv_mont_" + str(j)], pj, pinv_j, xp))
    out_lo = a[0]
    out_hi = xp.zeros_like(out_lo)
    for i in range(1, k):
        p_lo, p_hi = c["prods128"][i]
        t_lo, t_hi = mul_u32_by_u128(a[i], p_lo, p_hi, xp)
        out_lo, out_hi = add128(out_lo, out_hi, t_lo, t_hi, xp)
    h = c["half_digits"]
    is_neg = a[0] > h[0]
    for i in range(1, k):
        is_neg = (a[i] > h[i]) | ((a[i] == h[i]) & is_neg)
    pm_lo, pm_hi = c["P_mod128"]
    c_lo, c_hi = sub128(out_lo, out_hi,
                        xp.full(out_lo.shape, pm_lo, out_lo.dtype),
                        xp.full(out_hi.shape, pm_hi, out_hi.dtype), xp)
    return xp.where(is_neg, c_lo, out_lo), xp.where(is_neg, c_hi, out_hi)


def negacyclic_polymul_u128(a_lo, a_hi, b_lo, b_hi, plan: NttPlan, xp):
    """Exact negacyclic (X^N + 1) product of u128 polynomials, mod 2^128.

    Requires a plan whose prime product exceeds 2 * N * 2^128 * max|b| —
    use >= 6 primes when one operand is a binary key (|b| <= 1: 2^140),
    8 primes for general u128 x small-digit products.
    """
    fa = forward_all_u128(a_lo, a_hi, plan, xp)
    fb = forward_all_u128(b_lo, b_hi, plan, xp)
    fb_m = to_mont_all(fb, plan, xp)
    prod = pointwise_mul_mont(fa, fb_m, plan, xp)
    coeffs = inverse_all(prod, plan, xp)
    return garner_to_u128(coeffs, plan, xp)
