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
PRIMES = (2130706433, 2113929217, 2013265921, 1811939329)

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

    @property
    def num_primes(self) -> int:
        return len(self.primes)


@lru_cache(maxsize=None)
def make_plan(n: int, num_primes: int = 4) -> NttPlan:
    assert n & (n - 1) == 0, "N must be a power of two"
    primes = PRIMES[:num_primes]
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
    return NttPlan(n=n, primes=primes, plans=tuple(plans))


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
    """Precompute Garner mixed-radix constants for up to 4 primes."""
    k = len(primes)
    consts = {}
    for j in range(1, k):
        pj = primes[j]
        prod = 1
        for i in range(j):
            prod = (prod * primes[i]) % pj
        consts[f"inv_{j}"] = _U64(pow(prod, -1, pj))
    # partial products mod each later prime, and mod 2^64
    consts["p_mod"] = {}
    for j in range(1, k):
        pj = primes[j]
        for i in range(j):
            prodi = 1
            for t in range(i + 1):
                prodi = (prodi * primes[t]) % pj
            consts["p_mod"][(i, j)] = _U64(prodi)
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
    a = [residues[..., 0, :]]
    for j in range(1, k):
        pj = _U64(primes[j])
        # v = (a0 + a1*p0 + ... ) mod pj
        v = a[0] % pj
        for i in range(1, j):
            v = (v + a[i] * c["p_mod"][(i - 1, j)]) % pj
        r = residues[..., j, :] % pj
        d = xp.where(r >= v, r - v, r + pj - v)
        aj = (d * c["inv_" + str(j)]) % pj
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
