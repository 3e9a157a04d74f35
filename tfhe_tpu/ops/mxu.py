"""MXU-factorized blind rotation: the external product as int8-limb matmuls.

The TPU systolic array (MXU) does int8 x int8 -> int32 matmuls at hundreds
of TOPS while 32-bit vector multiplies are emulated 16-bit ops on the VPU
(~20 ops each).  This module refactors the CMux external product so ~97% of
its multiplies are MXU matmuls:

  1. Four-step negacyclic NTT, N = N1*N2 (N1=128): the stage-1/stage-1' DFTs
     are (N1 x N1) matrices -> matmuls with K = 128.
  2. THE MIDDLE COLLAPSE: everything between the two stage-1s — forward
     twiddle, stage-2 DFT, pointwise multiply by the (fixed per key) GGSW
     NTT values, inverse stage-2, inverse twiddle — is, for each row k1, a
     FIXED (N2 x N2) linear map mod p.  Those maps are precomputed from the
     bootstrap key at conversion time (bsk_to_mxu) and applied as batched
     matmuls.  No per-step twiddle or pointwise VPU multiplies remain.
  3. 30-bit modmuls decompose exactly into 4x4 int8-limb (7-bit) matmuls
     whose int32 diagonal sums are recombined mod p in a cheap epilogue
     (digits are balanced limbs in [-64,63]; mod-p residues unsigned 7-bit).

Primes: four 28-bit pseudo-Fermat primes p = 2^28 - a*2^m + 1 (a small, odd)
so 2^28 folds to shift-adds; product 2^112 > the exact-product bound
2*l*(k+1)*N*B/2*2^63 (2^99 for the 2_2 family).

Reference structural counterpart: the collapse plays the role of the CUDA
classic PBS kernel's fused NTT+pointwise (backends/tfhe-cuda-backend/cuda/
src/pbs/programmable_bootstrap_classic.cu:746); the math is the standard
four-step factorization of the same exact CRT-NTT as ops/ntt.py, so outputs
are bit-identical to the existing XLA/Pallas paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt

# 28-bit pseudo-Fermat NTT primes p = 2^28 - a*2^m + 1, descending;
# v2(p-1) >= 13 (negacyclic N <= 4096), p0 < 2*p3 (Garner).
MXU_PRIMES = (268369921, 268361729, 268271617, 268238849)
#              a=1,m=16   a=9,m=13   a=5,m=15   a=3,m=16
N_PRIMES_DEFAULT = len(MXU_PRIMES)

LIMB_BITS = 7
N_LIMBS = 4  # 4*7 = 28 bits

U64 = np.uint64
I64 = jnp.int64


def _pow(b, e, p):
    return pow(int(b), int(e), int(p))


def _modmat_u64(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    """(…, m, k) @ (k, n) mod p in u64, chunking K so sums stay < 2^64."""
    k = a.shape[-1]
    chunk = max(1, (1 << 63) // (p * p))
    acc = None
    for s in range(0, k, chunk):
        part = np.matmul(a[..., s:s + chunk], b[s:s + chunk]) % U64(p)
        acc = part if acc is None else (acc + part) % U64(p)
    return acc


def _limbs_unsigned(x: np.ndarray) -> np.ndarray:
    """u64/u32 residues < 2^28 -> (N_LIMBS, ...) int8 limbs in [0, 128)."""
    out = np.empty((N_LIMBS,) + x.shape, dtype=np.int8)
    v = x.astype(np.uint64)
    for e in range(N_LIMBS):
        out[e] = ((v >> np.uint64(LIMB_BITS * e)) & np.uint64(127)).astype(np.int8)
    return out


@dataclass(frozen=True, eq=False)
class MxuPlan:
    n: int
    n1: int
    n2: int
    primes: tuple
    garner: ntt.NttPlan           # Garner/consts over the MXU primes
    w1_limbs: np.ndarray          # (P, L, N1, N1) int8 — fwd stage-1 (twist folded)
    w1i_limbs: np.ndarray         # (P, L, N1, N1) int8 — inv stage-1 (untwist+1/N... see build)
    # host-side middle-build tables (u64): see bsk_to_mxu
    tw_full: np.ndarray           # (P, N) full psi twist
    w1c: np.ndarray               # (P, N1, N1) cyclic stage-1 matrix
    twmid: np.ndarray             # (P, N1, N2) omega^{k1*i2}
    w2: np.ndarray                # (P, N2, N2)
    f_mid: np.ndarray             # (P, N1, N2, N2) tw_f-folded W2
    g_mid: np.ndarray             # (P, N1, N2, N2) W2i folded with tw_i
    round_bits: int = 0           # BSK rounding (3-prime mode; see round_bsk)

    @property
    def num_primes(self):
        return len(self.primes)


@lru_cache(maxsize=None)
def make_mxu_plan(n: int, n1: int = 128,
                  num_primes: int = len(MXU_PRIMES),
                  round_bits: int = 0) -> MxuPlan:
    assert n % n1 == 0 and n >= n1
    n2 = n // n1
    primes = MXU_PRIMES[:num_primes]
    garner = ntt.make_plan(n, len(primes), primes=primes)
    w1_l, w1i_l = [], []
    tw_full, w1c_all, twmid_all, w2_all, f_all, g_all = [], [], [], [], [], []
    for p in primes:
        g = ntt._find_generator(p)
        psi = _pow(g, (p - 1) // (2 * n), p)
        assert _pow(psi, n, p) == p - 1
        om = _pow(psi, 2, p)
        psi_i = _pow(psi, p - 2, p)
        om_i = _pow(om, p - 2, p)
        n_inv = _pow(n, p - 2, p)
        # W1'[k1, i1] = om^{n2*i1*k1} * psi^{i1*n2}  (fwd twist folded)
        i1 = np.arange(n1)
        k1 = np.arange(n1)
        e = np.outer(k1, i1) * n2 % n
        w1 = np.array([[_pow(om, int(e[a, b]), p) for b in range(n1)]
                       for a in range(n1)], dtype=U64)
        twist_col = np.array([_pow(psi, int(b * n2), p) for b in range(n1)],
                             dtype=U64)
        w1p = (w1 * twist_col[None, :]) % U64(p)
        # W1i[j1, kk] = psi^{-j1*n2} * om^{-n2*j1*kk}
        w1i = np.array([[_pow(om_i, int(e[a, b]), p) for b in range(n1)]
                        for a in range(n1)], dtype=U64)
        untwist_row = np.array([_pow(psi_i, int(a * n2), p) for a in range(n1)],
                               dtype=U64)
        w1ip = (w1i * untwist_row[:, None]) % U64(p)
        w1_l.append(_limbs_unsigned(w1p))
        w1i_l.append(_limbs_unsigned(w1ip))
        # middle-build tables
        tw_full.append(np.array([_pow(psi, i, p) for i in range(n)], dtype=U64))
        w1c_all.append(w1)
        i2 = np.arange(n2)
        k2 = np.arange(n2)
        twmid = np.array([[_pow(om, int(a * b), p) for b in range(n2)]
                          for a in range(n1)], dtype=U64)  # om^{k1*i2}
        twmid_all.append(twmid)
        e2 = np.outer(i2, k2) * n1 % n
        w2 = np.array([[_pow(om, int(e2[a, b]), p) for b in range(n2)]
                       for a in range(n2)], dtype=U64)
        w2i = np.array([[_pow(om_i, int(e2[a, b]), p) for b in range(n2)]
                        for a in range(n2)], dtype=U64)
        w2_all.append(w2)
        # tw_f[k1, i2] = om^{i2*k1} * psi^{i2}
        psi_i2 = np.array([_pow(psi, int(b), p) for b in range(n2)], dtype=U64)
        tw_f = (twmid * psi_i2[None, :]) % U64(p)
        # tw_i[k1, j2] = om^{-j2*k1} * psi^{-j2} / N
        twmid_i = np.array([[_pow(om_i, int(a * b), p) for b in range(n2)]
                            for a in range(n1)], dtype=U64)
        psii_j2 = np.array([_pow(psi_i, int(b), p) * n_inv % p for b in range(n2)],
                           dtype=U64)
        tw_i = (twmid_i * psii_j2[None, :]) % U64(p)
        # F[k1, i2, k2] = tw_f[k1, i2] * W2[i2, k2]
        f_mid = (tw_f[:, :, None] * w2[None, :, :]) % U64(p)
        # G[k1, k2, j2] = W2i[k2, j2] * tw_i[k1, j2]
        g_mid = (w2i[None, :, :] * tw_i[:, None, :]) % U64(p)
        f_all.append(f_mid)
        g_all.append(g_mid)
    return MxuPlan(
        n=n, n1=n1, n2=n2, primes=primes, garner=garner,
        w1_limbs=np.stack(w1_l), w1i_limbs=np.stack(w1i_l),
        tw_full=np.stack(tw_full), w1c=np.stack(w1c_all),
        twmid=np.stack(twmid_all), w2=np.stack(w2_all),
        f_mid=np.stack(f_all), g_mid=np.stack(g_all),
        round_bits=round_bits,
    )


def _forward_eval(polys: np.ndarray, plan: MxuPlan, pi: int,
                  mont: bool = False) -> np.ndarray:
    """Host four-step forward NTT of u64 polys (..., N) mod prime pi.

    Returns evaluations ordered (..., N1 k1, N2 k2): slot (k1,k2) holds
    P(psi^(2*(k2*N1+k1)+1)).  mont=True scales by 2^32 mod p (Montgomery
    domain, consumed by the v3 kernel's single-REDC fold)."""
    p = plan.primes[pi]
    n1, n2 = plan.n1, plan.n2
    if polys.dtype == np.int64:   # signed centered coeffs (3-prime mode)
        res = (polys % np.int64(p)).astype(U64)
    else:
        res = polys.astype(U64) % U64(p)
    tw = plan.tw_full[pi]
    if mont:
        tw = (tw * U64((1 << 32) % p)) % U64(p)
    xt = (res * tw[None]) % U64(p)
    a = xt.reshape(xt.shape[:-1] + (n1, n2))
    s = _modmat_u64(a.swapaxes(-1, -2), plan.w1c[pi].T, p).swapaxes(-1, -2)
    # s[k1, i2] = sum_i1 W1c[k1,i1] a[i1,i2]
    bmid = (s * plan.twmid[pi][None]) % U64(p)
    xhat = _modmat_u64(bmid, plan.w2[pi], p)  # (…, N1 k1, N2 k2)
    return xhat


def mask_floor_bsk(bsk, glwe_sk, round_bits: int):
    """Exact, phase-preserving re-randomization of a BSK onto 2^rb-aligned
    masks (keygen-side; requires the GLWE secret key).

    For each GLWE row (a_1..a_k, b): the dropped low bits r_j = a_j mod 2^rb
    are moved into the body, b' = b - sum_j r_j (*) s_j (negacyclic, exact
    mod 2^64), a'_j = a_j - r_j.  Phases are IDENTICAL (b' - <a', s> =
    b - <a, s>), so this costs zero noise; a subsequent round_bsk then only
    perturbs the BODY coefficient, which kills the (1 + k*N/2) mask-error
    amplification of the rounding noise (core/noise.
    bsk_rounding_additive_variance) — the production 3-prime configuration's
    soundness fix (tests/test_noise_rounded_bsk.py).

    Security: the floored masks are uniform over 2^rb * Z_{2^(64-rb)}, i.e.
    the GGSWs become GLWE samples over ciphertext modulus 2^(64-rb) embedded
    in 2^64 — the same dimension and the same ABSOLUTE noise at a smaller
    modulus, a strictly harder lattice instance than the original.
    """
    from ..core.entities import LweBootstrapKey

    data = np.asarray(bsk.data)
    n_in, lev, rows, k1c, n = data.shape
    k = k1c - 1
    low = data[..., :k, :] & np.uint64((1 << round_bits) - 1)   # r_j
    # negacyclic circulant of each secret poly: S[j][i, out] for r (*) s_j
    out = data.copy()
    out[..., :k, :] -= low
    corr = np.zeros(data.shape[:3] + (n,), dtype=np.uint64)
    idx = np.arange(n)
    for j in range(k):
        s = glwe_sk.data[j].astype(np.int64)
        # circ[i, o] = sign * s[o - i mod n], negacyclic wrap
        mat = s[(idx[None, :] - idx[:, None]) % n].astype(np.float64)
        sign = np.where(idx[None, :] < idx[:, None], -1.0, 1.0)
        mat = mat * sign
        r = low[..., j, :].reshape(-1, n).astype(np.float64)    # < 2^rb
        # exact in f64: |sum| <= N * 2^rb < 2^(11+rb) << 2^53 for rb <= 40
        assert round_bits + 11 < 52
        prod = r @ mat                                          # (rows, n)
        corr += prod.astype(np.int64).astype(np.uint64).reshape(corr.shape)
    out[..., k, :] -= corr
    return LweBootstrapKey(out, bsk.decomp, bsk.bits)


def round_bsk(bsk, round_bits: int):
    """Centered-round every BSK coefficient to a multiple of 2^round_bits.

    A key-preparation modulus switch (torus scale preserved): each u64
    coefficient b becomes b_r = round(b / 2^rb) * 2^rb mod 2^64.  The engine
    then runs the CRT convolution on the SIGNED quotients b' = b_r / 2^rb
    (|b'| <= 2^(63-rb)) and shifts the reconstructed integer back left by rb
    — exact, since the true external-product term is 2^rb * sum(a*b').  The
    2^rb-smaller convolution bound lets THREE 28-bit primes replace four
    (prod 2^84 > 2 * l*(k+1)*N*(B/2)*2^(63-rb) for the 2_2 family at
    rb = 15) — a ~25% cut of all per-prime kernel work.

    Noise cost: each coefficient gains a uniform error in (-2^(rb-1),
    2^(rb-1)].  On a mask-floored key (mask_floor_bsk — the production
    ServerKey configuration) only the BODY is perturbed and the added PBS
    output variance is n*l*(k+1)*N * (B^2+2)/12 * 2^(2rb)/12 — ~0.6% of the
    2_2 PBS output variance at rb = 15, pfail impact < 0.1 bit.  On a RAW
    key the mask errors convolve with the GLWE secret and the term is
    amplified by (1 + k*N/2) = 1025x at 2_2 — measured and modeled in
    core/noise.bsk_rounding_additive_variance + tests/
    test_noise_rounded_bsk.py; that is why ServerKey floors first.
    Both the XLA MXU path and the fused kernel consume the SAME rounded key,
    so the bit-exactness invariant between paths is preserved.
    """
    from ..core.entities import LweBootstrapKey

    half = np.uint64(1 << (round_bits - 1))
    mask = np.uint64((1 << round_bits) - 1)
    d = (bsk.data.astype(np.uint64) + half) & ~mask
    return LweBootstrapKey(d, bsk.decomp, bsk.bits)


def assert_crt_bound(bsk, plan: MxuPlan, round_bits: int = 0):
    """The CRT product must exceed twice the exact integer convolution bound
    |X| <= l*(k+1)*N*(B/2)*max|b| (balanced digits x centered coefficients)."""
    import math

    bmax = ((1 << 63) >> round_bits) + 1
    lev, k1r = bsk.level_count, bsk.glwe_size
    base_log = bsk.decomp.base_log
    max_x = lev * k1r * plan.n * (1 << (base_log - 1)) * bmax
    prod = math.prod(plan.primes)
    assert prod > 2 * max_x, (
        f"CRT product 2^{prod.bit_length()} <= bound 2^{(2 * max_x).bit_length()}"
        f" ({plan.num_primes} primes, round_bits={round_bits}) — use more"
        " primes or a larger round_bits")


def _prep_bsk_data(bsk, plan: MxuPlan) -> np.ndarray:
    """Round + scale the BSK per plan.round_bits; check the CRT bound.

    Returns u64 coefficients (rb = 0) or the int64 signed quotients
    b' = centered(b_rounded) / 2^rb (rb > 0), whose residues _forward_eval
    takes signed."""
    rb = plan.round_bits
    if rb:
        bsk = round_bsk(bsk, rb)
    assert_crt_bound(bsk, plan, rb)
    data = np.ascontiguousarray(bsk.data.astype(U64))
    if rb:
        return data.view(np.int64) >> np.int64(rb)
    return data


def bsk_to_mxu(bsk, plan: MxuPlan = None, mont: bool = False):
    """Convert a coefficient-domain LweBootstrapKey into middle-collapse
    limb tensors.

    bsk.data: (n_in, l, k+1, k+1, N) u64.  Returns (m_limbs, plan):
    m_limbs int8 (n_in, P, L, N1, l*(k+1)*N2, (k+1)*N2) — for each input
    mask element and prime, the per-k1 batched middle matrices with the
    (level, in-poly, slot) contraction flattened and (out-poly, slot) as
    output columns.  plan.round_bits > 0 (3-prime mode) rounds the key and
    converts the 2^rb-scaled quotients — see round_bsk.
    """
    if plan is None:
        plan = make_mxu_plan(bsk.polynomial_size)
    data = _prep_bsk_data(bsk, plan)
    n_in, lev, k1r, k1c, n = data.shape
    n1, n2 = plan.n1, plan.n2
    per_prime = []
    for pi, p in enumerate(plan.primes):
        xhat = _forward_eval(data, plan, pi, mont)  # (n_in, l, r, c, N1, N2)
        # H[k1, k2, j2] = xhat[k1, k2] * G[k1, k2, j2]
        h = (xhat[..., :, :, None] * plan.g_mid[pi][None, None, None, None]) % U64(p)
        # M[k1, i2, j2] = sum_k2 F[k1, i2, k2] * H[k1, k2, j2]
        f = plan.f_mid[pi]                      # (N1, N2, N2)
        m = np.matmul(f[None, None, None, None], h) % U64(p)
        # (n_in, l, r, c, N1, i2, j2) -> (n_in, N1, l, r, i2, c, j2)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6)
        m = m.reshape(n_in, n1, lev * k1r * n2, k1c * n2)
        per_prime.append(_limbs_unsigned(m))    # (L, n_in, N1, K, C)
    stacked = np.stack(per_prime)               # (P, L, n_in, N1, K, C)
    m_limbs = np.ascontiguousarray(stacked.transpose(2, 0, 1, 3, 4, 5))
    return m_limbs, plan


def bsk_eval_domain(bsk, plan: MxuPlan = None, mont: bool = False):
    """Host half of the key conversion: coefficient BSK -> NTT evaluations
    b_hat (n, l, k+1, k+1, P, N1, N2) u32 (the ~16x smaller precursor of the
    middle tensors; the heavy M assembly runs on device).  plan.round_bits:
    see round_bsk (3-prime mode)."""
    if plan is None:
        plan = make_mxu_plan(bsk.polynomial_size)
    data = _prep_bsk_data(bsk, plan)
    outs = []
    for pi in range(plan.num_primes):
        outs.append(_forward_eval(data, plan, pi, mont).astype(np.uint32))
    return np.ascontiguousarray(np.stack(outs, axis=-3)), plan


def _pick_chunk(n_in: int, chunk: int) -> int:
    """Largest divisor of n_in that is <= chunk (so every chunk shares ONE
    jitted executable and no tail shape recompiles); falls back to `chunk`
    with a zero-padded tail when n_in is awkward (prime-ish)."""
    for c in range(min(chunk, n_in), 0, -1):
        if n_in % c == 0:
            if c >= max(8, chunk // 4):
                return c
            break
    return chunk


@lru_cache(maxsize=None)
def _middle_chunk_jit(plan: MxuPlan):
    return jax.jit(lambda bh: _middle_from_eval_chunk(bh, plan))


@lru_cache(maxsize=None)
def _middle_v5_chunk_jit(plan: MxuPlan):
    return jax.jit(lambda bh: _middle_v5_chunk(bh, plan))


def middle_from_eval_device(bhat, plan: MxuPlan, dgroup: bool = False,
                            chunk: int = 48):
    """Device-side M assembly: M = F * diag(b_hat) * G mod p, limb-extracted.

    bhat: (n, l, r, c, P, N1, N2) u32 on device.  Returns m_limbs int8
    (n, P, L, N1, l*r*N2, c*N2) materialized in HBM — avoids shipping the
    ~16x larger middle tensors over the host link (which is the bottleneck
    behind a tunnel and a waste of PCIe anywhere).  dgroup=True emits the
    kernel's diagonal-grouped layout directly.

    Processed in jitted chunks of `chunk` mask elements (one compiled
    executable reused across chunks — unjitted, the per-op dispatch through
    the device link dominates) so the emulated-u64 workspace stays a small
    fraction of HBM (full-key intermediates are ~4 GB each and overflow a
    16 GB chip alongside the outputs).

    Arithmetic: u64 Montgomery (REDC32) — no division, XLA-exact.
    """
    n_in = bhat.shape[0]
    c = _pick_chunk(n_in, chunk)
    fn = _middle_chunk_jit(plan)
    parts = []
    for s in range(0, n_in, c):
        bh = bhat[s:s + c]
        if bh.shape[0] < c:       # awkward n_in: zero-pad the tail chunk
            bh = jnp.pad(bh, ((0, c - bh.shape[0]),) + ((0, 0),) * (bh.ndim - 1))
            part = fn(bh)[:n_in - s]
        else:
            part = fn(bh)
        parts.append(regroup_middle_d(part) if dgroup else part)
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)


def _middle_from_eval_chunk(bhat, plan: MxuPlan):
    n_in, lev, r_, c_, p_, n1, n2 = bhat.shape
    r64 = 1 << 32
    per_prime = []
    for pi, p in enumerate(plan.primes):
        pinv = U64(((r64 - pow(p, -1, r64)) % r64))
        pu = U64(p)
        g_m = jnp.asarray((plan.g_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))                # (N1, N2k2, N2j2) Mont
        f_m = jnp.asarray((plan.f_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))                # (N1, N2i2, N2k2) Mont
        bh = bhat[..., pi, :, :].astype(jnp.uint64)          # (n,l,r,c,N1,N2k2)
        # H[k1, k2, j2] = bhat[k1, k2] * G[k1, k2, j2] mod p (normal domain)
        h = ntt.mont_mul(bh[..., :, None],
                         g_m[None, None, None, None], pu, pinv, jnp)
        # M[k1, i2, j2] = sum_k2 F[k1, i2, k2] * H[k1, k2, j2] mod p
        acc = None
        for k2 in range(n2):
            term = ntt.mont_mul(h[..., k2, :][..., None, :],
                                f_m[None, None, None, None, :, :, k2, None],
                                pu, pinv, jnp)   # (n,l,r,c,N1,N2i2,N2j2)
            acc = term if acc is None else acc + term
        # lazy sum < N2*p < 2^33: one REDC then re-enter via R^2
        r2 = U64((r64 * r64) % p)
        y = ntt.mont_mul(acc, U64(1), pu, pinv, jnp)
        m = ntt.mont_mul(y, r2, pu, pinv, jnp)
        # (n, l, r, c, N1, i2, j2) -> (n, N1, l, r, i2, c, j2)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6).reshape(
            n_in, n1, lev * r_ * n2, c_ * n2)
        limbs = jnp.stack([((m >> np.uint64(LIMB_BITS * e)) & np.uint64(127))
                           .astype(jnp.int8) for e in range(N_LIMBS)])
        per_prime.append(limbs)                              # (L, n, N1, K, C)
    stacked = jnp.stack(per_prime)                           # (P, L, n, N1, K, C)
    return jnp.transpose(stacked, (2, 0, 1, 3, 4, 5))


def byte_limbs_balanced(x, nb: int = 4) -> np.ndarray:
    """Values < 2^31 (u64/u32) -> (nb, ...) int8 balanced radix-256 digits:
    x = sum_f out[f] * 256^f, out[f] in [-128, 127]."""
    out = np.empty((nb,) + x.shape, dtype=np.int8)
    v = x.astype(np.int64)
    for f in range(nb):
        le = ((v + 128) & 255) - 128
        out[f] = le.astype(np.int8)
        v = (v - le) >> 8
    assert (v == 0).all(), "byte_limbs_balanced: values too large"
    return out


CENT = 128 * 0x01010101   # centered-byte correction weight sum_e 128*2^(8e)


def _pack_v5_bytes_np(digits: np.ndarray) -> np.ndarray:
    """(4, ...) int8 balanced digits -> u32 words with byte u = digit (3-u)
    (reverse byte order).  The v5 kernel derives the diagonal-d lhs as a
    single u32 shift of these words: W_d = V >> 8*(3-d) (d <= 3) or
    V << 8*(d-3), whose byte e is digit (d-e) with zero-fill exactly where
    the diagonal grouping needs zeros; pltpu.bitcast then reinterprets the
    shifted words as the (kk, byte)-interleaved int8 contraction rows."""
    v = np.zeros(digits.shape[1:], np.uint32)
    for j in range(4):
        v |= (digits[j].astype(np.uint8).astype(np.uint32)
              << np.uint32(8 * (3 - j)))
    return v


def bsk_to_mxu_v5(bsk, plan: MxuPlan = None):
    """Middle tensors for the v5 byte-limb kernel.

    Returns (v32, corr_mid, plan):
      v32  u32 (n_in, P, N1, 2*K, C): reverse-byte-packed balanced digits
           (_pack_v5_bytes_np) of M (rows fam=0, contraction K on the
           second-minor axis) and of 2^32 * M mod p (rows fam=1, consumed
           by the hi word of the pair interface), C on the lanes;
      corr_mid u32 (n_in, P, N1, C): per-step centered-byte correction
           (128 * 0x01010101 * sum_K (M + M32)) mod p, pair-added once in
           the kernel's mid assembly.
    """
    if plan is None:
        plan = make_mxu_plan(bsk.polynomial_size)
    data = _prep_bsk_data(bsk, plan)
    n_in, lev, k1r, k1c, n = data.shape
    n1, n2 = plan.n1, plan.n2
    packed, corrs = [], []
    for pi, p in enumerate(plan.primes):
        xhat = _forward_eval(data, plan, pi)
        h = (xhat[..., :, :, None] * plan.g_mid[pi][None, None, None, None]) % U64(p)
        f = plan.f_mid[pi]
        m = np.matmul(f[None, None, None, None], h) % U64(p)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6)
        m = m.reshape(n_in, n1, lev * k1r * n2, k1c * n2)  # (n, N1, K, C)
        m32 = (m * U64((1 << 32) % p)) % U64(p)
        packed.append(np.concatenate(
            [_pack_v5_bytes_np(byte_limbs_balanced(m)),
             _pack_v5_bytes_np(byte_limbs_balanced(m32))], axis=-2))
        s = m.sum(axis=-2, dtype=np.uint64) + m32.sum(axis=-2,
                                                      dtype=np.uint64)
        corrs.append(((s % U64(p)) * U64(CENT % p) % U64(p)).astype(np.uint32))
    v32 = np.ascontiguousarray(
        np.stack(packed).transpose(1, 0, 2, 3, 4))         # (n, P, N1, 2K, C)
    corr = np.ascontiguousarray(np.stack(corrs).transpose(1, 0, 2, 3))
    return v32, corr, plan


def _v8_consts(plan: MxuPlan, base_log: int):
    """Static v8 constants per prime: the s1 correction c1(k1) folded into
    the middle correction (the v8 kernel defers the s1 assembly to the mid
    matmul's (M, 2^16*M) families), plus the deferred-word offset OFFS.

    c1(k) = 128 * sum_e sum_i (2^(8e) W1'[k,i]) - OFF * sum_i W1'[k,i]
    (the XOR-centering + digit-offset compensation of the jfold s1 stage);
    gamma(k) = c1(k) - OFFS*(1 + 2^16): the per-value additive constant of
    the deferred representation S_true = dgA + 2^16*dgB + gamma (mod p).
    """
    OFF = 1 << (base_log - 1)
    b_s1 = 3 * plan.n1 * 128 * 128          # per-diag |bound| of the s1 dot
    OFFS = 257 * b_s1                       # dg pair offset; < 2^31
    assert 2 * OFFS < (1 << 32)

    def vals(limbs):
        return sum(limbs[:, e].astype(np.uint64) << np.uint64(LIMB_BITS * e)
                   for e in range(N_LIMBS))

    w1 = vals(plan.w1_limbs)                # (P, k, i)
    gammas = []
    for pi, p in enumerate(plan.primes):
        s1j = np.zeros(plan.n1, dtype=object)
        for e in range(3):
            s1j += ((w1[pi].astype(object) << (8 * e)) % p).sum(axis=1)
        s1w = w1[pi].astype(object).sum(axis=1)
        c1 = (128 * s1j - OFF * s1w) % p
        gamma = (c1 - OFFS * (1 + (1 << 16))) % p
        gammas.append(gamma.astype(np.uint64))
    return np.stack(gammas), OFFS           # (P, N1) u64, int


def bsk_to_mxu_v8(bsk, plan: MxuPlan, base_log: int, ss: int = 4):
    """Middle tensors for the v8 macro-step kernel (host build; the device
    twin is middle_v8_from_eval_device).

    Differences vs bsk_to_mxu_v5:
      * families are (M, 2^16*M mod p) — the kernel defers the s1 stage's
        pair assembly into the mid matmul (dgA + 2^16*dgB words);
      * the s1 correction c1(k1) and the deferred-word offsets are folded
        into corr (per-step static), so the kernel adds NO s1 constants;
      * `ss` consecutive steps are packed on the lane axis: v32 u32
        (ceil(n/ss), P, N1, 2K, ss*C) and corr (ceil(n/ss), P, N1, ss*C) —
        minor dim ss*C = 128 at the 2_2 family, so the (8,128) HBM tiling
        pads NOTHING (the v5 layout's C=32 minor wasted 4x HBM, which is
        what OOM'd the round-3 decompression bench; VERDICT r3 weak #3).
    Zero-padded tail steps are exact no-ops (zero M, zero corr, zero mask
    degree).
    """
    assert base_log <= 23
    data = _prep_bsk_data(bsk, plan)
    n_in, lev, k1r, k1c, n = data.shape
    n1, n2 = plan.n1, plan.n2
    gammas, _ = _v8_consts(plan, base_log)
    packed, corrs = [], []
    for pi, p in enumerate(plan.primes):
        xhat = _forward_eval(data, plan, pi)
        h = (xhat[..., :, :, None] * plan.g_mid[pi][None, None, None, None]) % U64(p)
        f = plan.f_mid[pi]
        m = np.matmul(f[None, None, None, None], h) % U64(p)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6)
        m = m.reshape(n_in, n1, lev * k1r * n2, k1c * n2)  # (n, N1, K, C)
        m16 = (m << np.uint64(16)) % U64(p)
        packed.append(np.concatenate(
            [_pack_v5_bytes_np(byte_limbs_balanced(m)),
             _pack_v5_bytes_np(byte_limbs_balanced(m16))], axis=-2))
        s = (m.sum(axis=-2, dtype=np.uint64)
             + m16.sum(axis=-2, dtype=np.uint64)) % U64(p)
        sm = m.sum(axis=-2, dtype=np.uint64) % U64(p)
        c = (s * U64(CENT % p) + sm * gammas[pi][None, :, None]) % U64(p)
        corrs.append(c.astype(np.uint32))
    v32 = np.stack(packed).transpose(1, 0, 2, 3, 4)       # (n, P, N1, 2K, C)
    corr = np.stack(corrs).transpose(1, 0, 2, 3)          # (n, P, N1, C)
    return (_group_ss(v32, ss), _group_ss(corr, ss), plan)


def _group_ss(x, ss: int):
    """(n, ..., C) -> (ceil(n/ss), ..., ss*C): `ss` steps' lane blocks packed
    side by side (step-major on the lanes), zero-padded tail."""
    xp = np if isinstance(x, np.ndarray) else jnp
    n = x.shape[0]
    n_g = -(-n // ss)
    if n_g * ss != n:
        pad = [(0, n_g * ss - n)] + [(0, 0)] * (x.ndim - 1)
        x = xp.pad(x, pad)
    y = x.reshape((n_g, ss) + x.shape[1:])
    # (n_g, ss, ..., C) -> (n_g, ..., ss, C) -> (n_g, ..., ss*C)
    perm = (0,) + tuple(range(2, y.ndim)) + (1,)
    y = xp.moveaxis(y, 1, -2)
    del perm
    return y.reshape(y.shape[:-2] + (y.shape[-2] * y.shape[-1],))


@lru_cache(maxsize=None)
def _middle_v8_chunk_jit(plan: MxuPlan, base_log: int):
    return jax.jit(lambda bh: _middle_v8_chunk(bh, plan, base_log))


def middle_v8_from_eval_device(bhat, plan: MxuPlan, base_log: int,
                               ss: int = 4, chunk: int = 48):
    """Device-side v8 middle build from the eval-domain precursor
    (bsk_eval_domain, mont=False): returns (v32, corr) as bsk_to_mxu_v8,
    computed in jitted chunks sharing one executable."""
    n_in = bhat.shape[0]
    c = _pick_chunk(n_in, chunk)
    fn = _middle_v8_chunk_jit(plan, base_log)
    outs_m, outs_c = [], []
    for s in range(0, n_in, c):
        bh = bhat[s:s + c]
        if bh.shape[0] < c:
            pad = c - bh.shape[0]
            bh = jnp.pad(bh, ((0, pad),) + ((0, 0),) * (bh.ndim - 1))
            v32, corr = fn(bh)
            v32, corr = v32[:n_in - s], corr[:n_in - s]
        else:
            v32, corr = fn(bh)
        outs_m.append(v32)
        outs_c.append(corr)
    v32 = outs_m[0] if len(outs_m) == 1 else jnp.concatenate(outs_m, axis=0)
    corr = outs_c[0] if len(outs_c) == 1 else jnp.concatenate(outs_c, axis=0)
    return _group_ss(v32, ss), _group_ss(corr, ss)


def _middle_v8_chunk(bhat, plan: MxuPlan, base_log: int):
    n_in, lev, r_, c_, p_, n1, n2 = bhat.shape
    r64 = 1 << 32
    gammas, _ = _v8_consts(plan, base_log)
    ms, cs = [], []
    for pi, p in enumerate(plan.primes):
        pinv = U64(((r64 - pow(p, -1, r64)) % r64))
        pu = U64(p)
        g_m = jnp.asarray((plan.g_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))
        f_m = jnp.asarray((plan.f_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))
        bh = bhat[..., pi, :, :].astype(jnp.uint64)
        h = ntt.mont_mul(bh[..., :, None],
                         g_m[None, None, None, None], pu, pinv, jnp)
        acc = None
        for k2 in range(n2):
            term = ntt.mont_mul(h[..., k2, :][..., None, :],
                                f_m[None, None, None, None, :, :, k2, None],
                                pu, pinv, jnp)
            acc = term if acc is None else acc + term
        r2 = U64((r64 * r64) % p)
        y = ntt.mont_mul(acc, U64(1), pu, pinv, jnp)
        m = ntt.mont_mul(y, r2, pu, pinv, jnp)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6).reshape(
            n_in, n1, lev * r_ * n2, c_ * n2)               # (n, N1, K, C)
        mi = m.astype(jnp.int32)
        # m16 = m * 2^16 mod p via Montgomery mul by (2^48 mod p):
        # REDC(m * 2^48) = m * 2^16 mod p
        c48 = U64(pow(2, 48, p))
        m16 = ntt.mont_mul(m, c48, pu, pinv, jnp).astype(jnp.int32)
        ms.append(jnp.concatenate(
            [_pack_v5_bytes_device(mi), _pack_v5_bytes_device(m16)],
            axis=-2))                                       # (n, N1, 2K, C)
        ssum = (mi.astype(jnp.uint64) + m16.astype(jnp.uint64)).sum(
            axis=-2, dtype=jnp.uint64) % pu                 # (n, N1, C)
        smm = mi.astype(jnp.uint64).sum(axis=-2, dtype=jnp.uint64) % pu
        g = jnp.asarray(gammas[pi])[None, :, None]
        cs.append(((ssum * U64(CENT % p) + smm * g) % pu).astype(jnp.uint32))
    v32 = jnp.transpose(jnp.stack(ms), (1, 0, 2, 3, 4))     # (n, P, N1, 2K, C)
    corr = jnp.transpose(jnp.stack(cs), (1, 0, 2, 3))
    return v32, corr


def transpose_middle(m_limbs):
    """(n, P, L, N1, K, C) middle limb tensors -> (n, P, L, N1, C, K) for the
    v4 aligned-layout kernel, whose mid dot is lhs=M^T (out-cols as rows):
    out[k1, c, el] = sum_k Mt[k1, c, k] * st[k1, k, el].  Works on numpy or
    jax arrays (device build: one-time swap)."""
    xp = np if isinstance(m_limbs, np.ndarray) else jnp
    return xp.swapaxes(m_limbs, -1, -2)


def _pack_v5_bytes_device(m_i32) -> "jnp.ndarray":
    """Device twin of _pack_v5_bytes_np over int32 values in [0, 2^31):
    balanced byte digits packed reverse-order into u32 words."""
    v = None
    x = m_i32
    for j in range(4):
        le = ((x + 128) & 255) - 128
        w = (le.astype(jnp.uint32) & jnp.uint32(0xFF)) << jnp.uint32(8 * (3 - j))
        v = w if v is None else v | w
        x = (x - le) >> 8
    return v


def middle_v5_from_eval_device(bhat, plan: MxuPlan, chunk: int = 48):
    """Device-side v5 middle build: (v32, corr) as in bsk_to_mxu_v5, computed
    from the ~16x smaller eval-domain precursor (bsk_eval_domain, mont=False)
    entirely on device, in jitted chunks sharing one compiled executable.
    v32 u32 (n, P, N1, 2K, C); corr u32 (n, P, N1, C).
    """
    n_in = bhat.shape[0]
    c = _pick_chunk(n_in, chunk)
    fn = _middle_v5_chunk_jit(plan)
    outs_m, outs_c = [], []
    for s in range(0, n_in, c):
        bh = bhat[s:s + c]
        if bh.shape[0] < c:
            pad = c - bh.shape[0]
            bh = jnp.pad(bh, ((0, pad),) + ((0, 0),) * (bh.ndim - 1))
            v32, corr = fn(bh)
            v32, corr = v32[:n_in - s], corr[:n_in - s]
        else:
            v32, corr = fn(bh)
        outs_m.append(v32)
        outs_c.append(corr)
    if len(outs_m) == 1:
        return outs_m[0], outs_c[0]
    return jnp.concatenate(outs_m, axis=0), jnp.concatenate(outs_c, axis=0)


def _middle_v5_chunk(bhat, plan: MxuPlan):
    n_in, lev, r_, c_, p_, n1, n2 = bhat.shape
    r64 = 1 << 32
    ms, cs = [], []
    for pi, p in enumerate(plan.primes):
        pinv = U64(((r64 - pow(p, -1, r64)) % r64))
        pu = U64(p)
        g_m = jnp.asarray((plan.g_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))
        f_m = jnp.asarray((plan.f_mid[pi].astype(object) * r64 % p)
                          .astype(np.uint64))
        bh = bhat[..., pi, :, :].astype(jnp.uint64)
        h = ntt.mont_mul(bh[..., :, None],
                         g_m[None, None, None, None], pu, pinv, jnp)
        acc = None
        for k2 in range(n2):
            term = ntt.mont_mul(h[..., k2, :][..., None, :],
                                f_m[None, None, None, None, :, :, k2, None],
                                pu, pinv, jnp)
            acc = term if acc is None else acc + term
        r2 = U64((r64 * r64) % p)
        y = ntt.mont_mul(acc, U64(1), pu, pinv, jnp)
        m = ntt.mont_mul(y, r2, pu, pinv, jnp)
        m = m.transpose(0, 4, 1, 2, 5, 3, 6).reshape(
            n_in, n1, lev * r_ * n2, c_ * n2)               # (n, N1, K, C)
        mi = m.astype(jnp.int32)
        # m32 = m * 2^32 mod p via one Montgomery mul by R^2 (REDC divides
        # by R): m * R^2 * R^{-1} = m * R
        m32 = ntt.mont_mul(m, r2, pu, pinv, jnp).astype(jnp.int32)
        ms.append(jnp.concatenate(
            [_pack_v5_bytes_device(mi), _pack_v5_bytes_device(m32)],
            axis=-2))                                       # (n, N1, 2K, C)
        ssum = (mi.astype(jnp.uint64) + m32.astype(jnp.uint64)).sum(
            axis=-2, dtype=jnp.uint64) % pu                 # (n, N1, C)
        cs.append((ssum * U64(CENT % p) % pu).astype(jnp.uint32))
    v32 = jnp.transpose(jnp.stack(ms), (1, 0, 2, 3, 4))     # (n, P, N1, 2K, C)
    corr = jnp.transpose(jnp.stack(cs), (1, 0, 2, 3))
    return v32, corr


def regroup_middle_d(m_limbs):
    """(n, P, L, N1, K, C) per-limb middle tensors -> diagonal-grouped
    (n, P, 2L-1, N1, L*K, C): for output diagonal d, contraction block e
    holds M-limb (d - e) or zeros.  Lets the kernel contract all limb pairs
    of a diagonal in ONE K=L*K matmul (1.75x bytes, ~4x fewer/larger dots).
    Works on numpy or jax arrays.
    """
    xp = np if isinstance(m_limbs, np.ndarray) else jnp
    n, p_, l_, n1, k, c = m_limbs.shape
    zeros = xp.zeros_like(m_limbs[:, :, 0])
    blocks = []
    for d in range(2 * l_ - 1):
        rows = [m_limbs[:, :, d - e] if 0 <= d - e < l_ else zeros
                for e in range(l_)]
        blocks.append(xp.concatenate(rows, axis=-2))
    return xp.stack(blocks, axis=2)


# ---------------------------------------------------------------------------
# Device-side (jnp) — exact, XLA-traceable; the Pallas kernel mirrors this
# ---------------------------------------------------------------------------


def _digit_limbs(digits, plan: MxuPlan):
    """Signed wrapped digits u64 (l, B, k+1, N) -> int8 balanced limbs
    (L, N1, B, l*(k+1)*N2) ordered for stage-1/middle consumption."""
    lev, b, kk, n = digits.shape
    n1, n2 = plan.n1, plan.n2
    d = digits.astype(jnp.int64)
    limbs = []
    for e in range(N_LIMBS):
        le = ((d + 64) & 127) - 64
        limbs.append(le.astype(jnp.int8))
        d = (d - le) >> 7
    lst = jnp.stack(limbs)                       # (L, l, B, k+1, N)
    lst = lst.reshape(N_LIMBS, lev, b, kk, n1, n2)
    # -> (L, N1, B, l, k+1, N2) -> (L, N1, B, l*(k+1)*N2)
    lst = lst.transpose(0, 4, 2, 1, 3, 5)
    return lst.reshape(N_LIMBS, n1, b, lev * kk * n2)


def _fold_diags_mod_p(diags, p: int):
    """diags: list of 2L-1 int32 arrays (signed ok) -> canonical residues
    uint32 < p.  Prototype epilogue: int64 Horner + one remainder."""
    acc = jnp.zeros(diags[0].shape, jnp.int64)
    for d in reversed(range(len(diags))):
        acc = (acc << 7) + diags[d].astype(jnp.int64)
    r = acc % np.int64(p)
    r = jnp.where(r < 0, r + np.int64(p), r)
    return r.astype(jnp.uint32)


def _limb_matmul(lhs_limbs, rhs_limbs, p: int, batched: bool):
    """Accumulate int8 limb matmuls into mod-p canonical residues.

    lhs_limbs: (L, [G,] M, K) int8; rhs_limbs: (L, [G,] K, C) int8.
    Returns uint32 ([G,] M, C) = (sum_{e,f} 2^{7(e+f)} lhs_e @ rhs_f) mod p.
    """
    ndiag = 2 * N_LIMBS - 1
    diags = [None] * ndiag
    dims = ((((2,), (1,)), ((0,), (0,))) if batched
            else (((1,), (0,)), ((), ())))
    for e in range(N_LIMBS):
        for f in range(N_LIMBS):
            prod = jax.lax.dot_general(lhs_limbs[e], rhs_limbs[f],
                                       dimension_numbers=dims,
                                       preferred_element_type=jnp.int32)
            d = e + f
            diags[d] = prod if diags[d] is None else diags[d] + prod
    return _fold_diags_mod_p(diags, p)


def external_product_mxu(glwe, m_limbs_step, plan: MxuPlan, base_log: int,
                         levels: int, bits: int = 64):
    """GGSW (x) GLWE external product through the MXU factorization.

    glwe: (B, k+1, N) u64; m_limbs_step: (P, L, N1, l*(k+1)*N2, (k+1)*N2)
    int8 (one mask element's middle tensor).  Returns (B, k+1, N) u64,
    bit-identical to ops.server.external_product_ntt.
    """
    from .server import signed_decompose

    b, kk, n = glwe.shape
    n1, n2 = plan.n1, plan.n2
    digits = signed_decompose(glwe, base_log, levels, bits)  # (l, B, k+1, N)
    dl = _digit_limbs(digits, plan)              # (L, N1, B, l*(k+1)*N2)
    outs = []
    for pi, p in enumerate(plan.primes):
        w1 = jnp.asarray(plan.w1_limbs[pi])      # (L, N1, N1)
        # stage 1: S[k1, (B, lr, i2)] = sum_i1 W1'[k1, i1] x[i1, ...]
        x = dl.reshape(N_LIMBS, n1, -1)          # (L, N1, B*lr*N2)
        s = _limb_matmul(w1, x, p, batched=False)  # (N1, B*lr*N2) u32
        # middle: batched over k1
        kmid = m_limbs_step.shape[-2]
        s = s.reshape(n1, b, kmid)
        sl = _limbs_unsigned_jnp(s)              # (L, N1, B, K)
        m = jnp.asarray(m_limbs_step[pi])        # (L, N1, K, C)
        v = _limb_matmul(sl, m, p, batched=True)  # (N1, B, C) u32
        # inverse stage 1: y[j1, (B, c, j2)] = sum_k1 W1i[j1,k1] V[k1, ...]
        w1i = jnp.asarray(plan.w1i_limbs[pi])
        vl = _limbs_unsigned_jnp(v.reshape(n1, -1))  # (L, N1, B*C)
        y = _limb_matmul(w1i, vl, p, batched=False)  # (N1, B*(k+1)*N2)
        y = y.reshape(n1, b, kk, n2).transpose(1, 2, 0, 3).reshape(b, kk, n)
        outs.append(y.astype(U64))
    res = jnp.stack(outs, axis=-2)               # (B, k+1, P, N)
    out = ntt.garner_to_u64(res, plan.garner, jnp)
    if plan.round_bits:        # scale the 2^-rb quotient convolution back
        out = out << jnp.uint64(plan.round_bits)
    return out


def _limbs_unsigned_jnp(x):
    """uint32 residues < 2^28 -> (L, ...) int8 limbs in [0, 128)."""
    return jnp.stack([((x >> np.uint32(LIMB_BITS * e)) & np.uint32(127)).astype(jnp.int8)
                      for e in range(N_LIMBS)])


def blind_rotate_mxu(msed_mask, msed_body, lut, m_limbs, plan: MxuPlan,
                     base_log: int, levels: int, bits: int = 64):
    """Batched blind rotation via the MXU external product.

    msed_mask: (B, n_in) u64 in [0, 2N); m_limbs: (n_in, P, L, N1, K, C)
    int8 from bsk_to_mxu.  Bit-identical to ops.server.blind_rotate.
    """
    from .server import monomial_div, monomial_mul

    acc0 = monomial_div(lut, msed_body[:, None, None])

    def step(acc, xs):
        a_i, mstep = xs
        ct1 = monomial_mul(acc, a_i[:, None, None]) - acc
        prod = external_product_mxu(ct1, mstep, plan, base_log, levels, bits)
        return acc + prod, None

    acc, _ = jax.lax.scan(step, acc0, (msed_mask.T, m_limbs))
    return acc


def blind_rotate_mxu_trunc(msed_mask, msed_body, lut, m_limbs, plan: MxuPlan,
                           base_log: int, levels: int, bits: int = 64):
    """Truncated-accumulator blind rotation (the kernel v7 semantics): the
    accumulator keeps only its TOP 32 bits — each step's external-product
    output is rounded to the 2^32 grid before accumulating.

    Rationale: the low accumulator bits are far below the noise floor; the
    per-step rounding adds n * 2^62/12 * (1+kN/2) ~ 2^78 to the output
    variance at 2_2 — vs a 2^107.5 budget (validated by
    tests/test_trunc_acc.py).  Halves the kernel's rotation/accumulator
    work.  The LUT is delta-aligned (multiples of 2^59 at 2_2), so the
    initial truncation is exact.
    """
    from .server import monomial_div, monomial_mul

    hi_mask = np.uint64(0xFFFFFFFF00000000)
    half = np.uint64(1 << 31)
    # round (not truncate) the initial accumulator — identical to the v7
    # kernel (pallas_mxu.blind_rotate_pallas_v5 trunc_acc), so the two
    # paths stay bit-exact even for non-delta-aligned LUTs
    acc0 = (monomial_div(lut, msed_body[:, None, None]) + half) & hi_mask

    def step(acc, xs):
        a_i, mstep = xs
        ct1 = monomial_mul(acc, a_i[:, None, None]) - acc
        prod = external_product_mxu(ct1, mstep, plan, base_log, levels, bits)
        prod_r = (prod + half) & hi_mask        # round to the 2^32 grid
        return acc + prod_r, None

    acc, _ = jax.lax.scan(step, acc0, (msed_mask.T, m_limbs))
    return acc


# ---------------------------------------------------------------------------
# Multi-bit fusion (v9): indicator pattern keys + rotation-of-digits form
# ---------------------------------------------------------------------------
# The multi-bit BSK (core/multibit.py, matching the reference's
# combine_key_bits convention) stores, per group j of g secret bits, 2^g
# INDICATOR GGSWs E_u encrypting prod_i (s_i if bit_i(u) else 1 - s_i) —
# exactly one of which encrypts 1.  The reference evaluates
# GGSW_eff = sum_u X^{d_u} E_u per ciphertext per group
# (prepare_multi_bit_ggsw_mem_optimized,
# lwe_multi_bit_programmable_bootstrapping.rs:116-160) — a per-element key
# recombination that would destroy the batch-shared middle tensors the MXU
# kernel depends on.  The TPU-native form moves each monomial onto the
# (per-element) data side of the external product instead:
#
#     acc' = EP(GGSW_eff, acc) = sum_u contract(E_u_middle,
#                                               decompose(X^{d_u} * acc))
#
# — the E_u middle tensors stay batch-shared (they pack into the mid-matmul
# contraction axis, 2^g x wider), and the per-element work is 2^g - 1
# negacyclic rolls of the accumulator per group (vs g rolls for g classic
# steps).  E_u's plaintexts are indicators, so exactly one pattern carries
# the payload: the decomposition-approximation noise matches ONE classic
# step per group, and the key noise term is 2^g var_bsk per group
# (core/noise.multibit_pbs_output_variance, = the reference's multi-bit
# noise formula structure).
# Soundness: each per-pattern Garner reconstruction is bounded by the
# classic per-step CRT bound; the fused kernel reconstructs the SUM over
# patterns, so its bound carries an extra 2^g factor
# (multibit_assert_crt_bound) — at the g=2 / base_log<=22 / round_bits=16
# production config this fits the 3-prime product exactly like the classic
# base 23 / rb=15 config does.


def multibit_assert_crt_bound(decomp, glwe_size: int, n_poly: int,
                              plan: MxuPlan, grouping: int,
                              round_bits: int = 0):
    """CRT bound for the fused multi-bit kernel: the mid matmul sums 2^g
    pattern convolutions before ONE Garner, so the exact-integer bound gains
    a 2^g factor over assert_crt_bound."""
    import math

    bmax = ((1 << 63) >> round_bits) + 1
    max_x = (1 << grouping) * decomp.level_count * glwe_size * n_poly \
        * (1 << (decomp.base_log - 1)) * bmax
    prod = math.prod(plan.primes)
    assert prod > 2 * max_x, (
        f"multibit CRT product 2^{prod.bit_length()} <= bound "
        f"2^{(2 * max_x).bit_length()} (g={grouping}, "
        f"{plan.num_primes} primes, round_bits={round_bits})")


def _prep_multibit_data(mb_data: np.ndarray, decomp, plan: MxuPlan,
                        grouping: int):
    """Round/scale (like _prep_bsk_data) for the fused kernel.
    mb_data: (n_g, 2^g, l, k+1, k+1, N) u64 indicator GGSWs (mask-floored
    when rb > 0).  Returns flattened (n_g * 2^g, l, k+1, k+1, N) signed
    quotients/u64."""
    from ..core.entities import LweBootstrapKey

    n_g, nsub, lev, k1r, k1c, n = mb_data.shape
    assert nsub == 1 << grouping
    flat = mb_data.reshape(n_g * nsub, lev, k1r, k1c, n)
    multibit_assert_crt_bound(decomp, k1c, n, plan, grouping,
                              plan.round_bits)
    bsk = LweBootstrapKey(flat, decomp, 64)
    rb = plan.round_bits
    if rb:
        bsk = round_bsk(bsk, rb)
    data = np.ascontiguousarray(bsk.data.astype(U64))
    if rb:
        return data.view(np.int64) >> np.int64(rb)
    return data


def multibit_eval_domain(mb_data: np.ndarray, decomp, plan: MxuPlan,
                         grouping: int):
    """Host half of the fused multi-bit key conversion: indicator pattern
    keys -> NTT evaluations (n_g * 2^g, l, k+1, k+1, P, N1, N2) u32 (the
    small precursor; the heavy middle assembly runs on device)."""
    data = _prep_multibit_data(mb_data, decomp, plan, grouping)
    outs = []
    for pi in range(plan.num_primes):
        outs.append(_forward_eval(data, plan, pi, False).astype(np.uint32))
    return np.ascontiguousarray(np.stack(outs, axis=-3))


@lru_cache(maxsize=None)
def _middle_v9_chunk_jit(plan: MxuPlan, base_log: int, grouping: int,
                         ss: int, subset_major: bool = False):
    """Chunk of the fused-multibit middle build, FINAL layout per macro
    group — the pattern fold + ss-grouping run chunk-locally so the caller
    never materializes the flat (n_g*2^g)-major tensor (at g=2/2_2 that
    intermediate is 5.4 GiB and holding flat+folded+grouped copies OOMs the
    16 GiB HBM — the round-3 decompression lesson, utils/hbm.py)."""
    nsub = 1 << grouping

    def fn(bh):
        v32, corr = _middle_v8_chunk(bh, plan, base_log)
        # (c, P, N1, 2K, C) -> per-group pattern fold along the contraction
        # axis, fam-major: [M_u0..M_u{2^g-1} | M16_u0..M16_u{2^g-1}]
        c_flat, p_, n1, twok, c_ = v32.shape
        gsz = c_flat // nsub
        k = twok // 2
        v32 = v32.reshape(gsz, nsub, p_, n1, 2, k, c_)
        if subset_major == "t_lanes":
            # rows [fam][k] (one group = 2*kmid rows, ss groups stacked on
            # rows below), lanes [u][cmid] (pattern-packed, nsub*cmid=128
            # at g=2/N=2048): the v9g kernel BlockSpec-slices ROWS by the
            # sub-group grid index jj and selects the pattern lane slice
            # in-kernel — the block index then changes only every 2^g
            # inner steps, so Pallas re-uses the DMA'd block across the
            # whole group (4x less key traffic than pattern-sliced rows)
            v32 = jnp.transpose(v32, (0, 2, 3, 4, 5, 1, 6)).reshape(
                gsz, p_, n1, 2 * k, nsub * c_)
        elif subset_major:
            # [u0: M|M16][u1: M|M16]... — each pattern owns a contiguous
            # 2*kmid row block so the v9g kernel can BlockSpec-slice the
            # middle tensor by the pattern grid index (rows are the
            # second-minor dim; lane slicing is illegal on TPU)
            v32 = jnp.transpose(v32, (0, 2, 3, 1, 4, 5, 6)).reshape(
                gsz, p_, n1, 2 * nsub * k, c_)
        else:
            v32 = jnp.transpose(v32, (0, 2, 3, 4, 1, 5, 6)).reshape(
                gsz, p_, n1, 2 * nsub * k, c_)
        # corr is linear in the st rows: sum per-pattern corrections mod p
        corr = corr.reshape(gsz, nsub, p_, n1, c_).astype(jnp.uint64)
        corr = corr.sum(axis=1)
        ps = jnp.asarray(np.array(plan.primes, np.uint64))[None, :, None,
                                                           None]
        corr = (corr % ps).astype(jnp.uint32)
        if subset_major == "t_lanes":
            g_, p2, n1_, r_, l_ = v32.shape
            v32g = jnp.transpose(
                v32.reshape(g_ // ss, ss, p2, n1_, r_, l_),
                (0, 2, 3, 1, 4, 5)).reshape(g_ // ss, p2, n1_, ss * r_, l_)
            return v32g, _group_ss(corr, ss)
        return _group_ss(v32, ss), _group_ss(corr, ss)

    return jax.jit(fn)


@partial(jax.jit, donate_argnums=(0,))
def _buf_write(buf, val, s):
    idx = (s,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, val, idx)


def middle_v9_from_eval_device(bhat, plan: MxuPlan, base_log: int,
                               grouping: int, ss: int = 2, chunk: int = 32,
                               subset_major: bool = False):
    """Device-side fused-multibit middle build.

    bhat: (n_g * 2^g, l, k+1, k+1, P, N1, N2) u32 from multibit_eval_domain
    (pattern index minor within each group).  Returns (v32, corr) shaped
    (ceil(n_g/ss), P, N1, 2 * 2^g * K, ss*C) / (..., ss*C): per GROUP, the
    2^g pattern middles concatenated along the contraction axis within each
    of the two deferred-word families, then `ss` groups packed on the lane
    axis (v8 layout rules; zero-padded tail groups are exact no-ops).

    Memory discipline: chunks are produced in the FINAL layout and written
    into donated preallocated buffers (peak = final size + one chunk, not
    3x the final size)."""
    nsub = 1 << grouping
    n_flat = bhat.shape[0]
    assert n_flat % nsub == 0
    n_g = n_flat // nsub
    n_macro = -(-n_g // ss)
    gsz = ss * nsub                       # flat entries per macro group
    c = _pick_chunk(n_flat, chunk * nsub)
    c = gsz * max(1, c // gsz)            # chunks hold whole MACRO groups
    fn = _middle_v9_chunk_jit(plan, base_log, grouping, ss, subset_major)
    v32_buf = corr_buf = None
    for s in range(0, n_flat, c):
        bh = bhat[s:s + c]
        if bh.shape[0] < c:
            pad = c - bh.shape[0]
            bh = jnp.pad(bh, ((0, pad),) + ((0, 0),) * (bh.ndim - 1))
        v32_c, corr_c = fn(bh)
        if v32_buf is None:
            v32_buf = jnp.zeros((n_macro,) + v32_c.shape[1:], v32_c.dtype)
            corr_buf = jnp.zeros((n_macro,) + corr_c.shape[1:], corr_c.dtype)
        sm = s // gsz
        if sm + v32_c.shape[0] > n_macro:     # zero-padded tail groups
            v32_c = v32_c[:n_macro - sm]
            corr_c = corr_c[:n_macro - sm]
        v32_buf = _buf_write(v32_buf, v32_c, sm)
        corr_buf = _buf_write(corr_buf, corr_c, sm)
    return v32_buf, corr_buf


def blind_rotate_mxu_multibit(degrees, msed_body, lut, m_limbs,
                              plan: MxuPlan, base_log: int, levels: int,
                              grouping: int, trunc: bool = False,
                              bits: int = 64):
    """XLA twin of the fused multi-bit kernel (exact; used for parity tests
    and CPU runs).

    degrees: (B, n_g, 2^g) u64 in [0, 2N) from
    server.multibit_switched_degrees; m_limbs: (n_g * 2^g, P, L, N1, K, C)
    int8 from bsk_to_mxu over the flattened indicator key
    (_prep_multibit_data semantics).  Per group: acc <- sum_u EP(E_u,
    X^{d_u} * acc).  trunc=True keeps the accumulator on the 2^32 grid
    (v7/v8 semantics)."""
    from .server import monomial_div, monomial_mul

    b, n_g, nsub = degrees.shape
    assert nsub == 1 << grouping
    assert m_limbs.shape[0] == n_g * nsub
    hi_mask = np.uint64(0xFFFFFFFF00000000)
    half = np.uint64(1 << 31)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    if trunc:
        acc0 = (acc0 + half) & hi_mask
    m_g = m_limbs.reshape((n_g, nsub) + m_limbs.shape[1:])

    def step(acc, xs):
        d_us, msub = xs                       # (B, 2^g), (2^g, P, L, N1, K, C)
        out = None
        for u in range(nsub):
            rot = monomial_mul(acc, d_us[:, u][:, None, None])
            prod = external_product_mxu(rot, msub[u], plan, base_log,
                                        levels, bits)
            out = prod if out is None else out + prod
        if trunc:
            out = (out + half) & hi_mask      # round to the 2^32 grid
        return out, None

    acc, _ = jax.lax.scan(step, acc0,
                          (jnp.transpose(degrees, (1, 0, 2)), m_g))
    return acc


def multibit_bsk_to_mxu(mb_data: np.ndarray, decomp, plan: MxuPlan,
                        grouping: int):
    """Host twin of the fused multi-bit key build for tests: round + middle
    collapse via bsk_to_mxu on the flattened indicator key.  Returns m_limbs
    (n_g * 2^g, P, L, N1, K, C) int8 for blind_rotate_mxu_multibit."""
    from ..core.entities import LweBootstrapKey

    flat = mb_data.reshape((-1,) + mb_data.shape[2:])
    multibit_assert_crt_bound(decomp, mb_data.shape[3], mb_data.shape[-1],
                              plan, grouping, plan.round_bits)
    m_limbs, _ = bsk_to_mxu(LweBootstrapKey(flat, decomp, 64), plan)
    return m_limbs
