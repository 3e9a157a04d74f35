"""v3 blind-rotate kernel: the MXU-factorized external product, fused.

Brings ops/mxu.py's factorization (four-step NTT stage-1s as 128x128
int8-limb matmuls + the per-k1 middle collapse) into a single Pallas kernel
with the accumulator VMEM-resident across all n CMux steps, replacing the
VPU-Montgomery butterflies of pallas_ntt.build_blind_rotate_v2 with MXU
matmuls (~97% of multiplies on the systolic array).

Layout ("lane-major four-step"): coefficient i = i1*N2 + i2 maps to
row (el*k1 + poly)*N2 + i2, lane i1 — so the stage-1 contraction (over i1)
is a plain matmul contracting the lane dimension, and rotation decomposes
into a dynamic lane-roll (X^(N2*a1)) plus a dynamic sublane-roll with
lane-borrow (X^(a2)).

Everything is bit-identical to ops/mxu.py (tested in interpret mode on CPU)
which is itself bit-identical to the XLA/butterfly path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu as mxu_mod
from . import ntt as ntt_mod
from .pallas_ntt import (
    U32,
    _decompose32,
    _u32,
    add64,
    add_mod32,
    mont_mul32,
    mulwide,
    neg64,
    sub64,
    shr64_to32,
)

LANES = 128
LB = mxu_mod.LIMB_BITS     # 7
NL = mxu_mod.N_LIMBS       # 4


# ---------------------------------------------------------------------------
# host-side constant prep
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _fold_consts(n: int, num_primes: int = mxu_mod.N_PRIMES_DEFAULT):
    """Per-prime constants for the diagonal-fold epilogue.

    value = t0 + t1*2^14 + t2*2^28 + t3*2^42 (mod p), via Montgomery
    multiplies by c_k = 2^(14k)*R mod p (c_0 = R makes REDC the identity).
    Signed inputs are pre-shifted by K_p (a multiple of p >= 2^30); the
    accumulated excess E = (sum_k K_p * 2^(14k)) mod p is subtracted once.
    """
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    out = []
    for p in plan.primes:
        r = (1 << 32) % p
        cks = [pow(2, 14 * k, p) * r % p for k in range(4)]
        k_p = ((1 << 30) // p + 1) * p          # < 2^31
        excess = sum(k_p * pow(2, 14 * k, p) for k in range(4)) % p
        out.append({"cks": cks, "k_p": k_p, "excess": excess})
    return tuple(out)


@lru_cache(maxsize=None)
def _kernel_tables(n: int, nl_inv: int = NL, mont: bool = False,
                   num_primes: int = mxu_mod.N_PRIMES_DEFAULT):
    """(w1t_limbs, w1i_limbs, plan) — stage-1 matrices in matmul orientation.

    w1t: (P, 2L-1, L*128, 128) int8 (rhs of the forward stage-1, 4-limb
    digit lhs); w1i: (P, nl_inv+L-1, nl_inv*128, 128) (rhs of the inverse
    stage-1, whose lhs has nl_inv limbs — 5 when the fold is lazy).
    mont=True scales the matrices by 2^32 mod p (single-REDC fold)."""
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)

    def rescale(limbs):
        if not mont:
            return limbs
        vals = sum(limbs[:, e].astype(np.uint64) << np.uint64(LB * e)
                   for e in range(NL))          # (P, N1, N1) u64
        ps = np.array(plan.primes, dtype=np.uint64)[:, None, None]
        r = np.array([(1 << 32) % p for p in plan.primes],
                     dtype=np.uint64)[:, None, None]
        scaled = (vals * r) % ps
        return np.stack([((scaled >> np.uint64(LB * e)) & np.uint64(127))
                         .astype(np.int8) for e in range(NL)], axis=1)

    def dgroup(limbs, nl_lhs):
        # (P, L, K, N1) -> (P, nl_lhs+L-1, nl_lhs*K, N1): diagonal-grouped
        zeros = np.zeros_like(limbs[:, 0])
        blocks = []
        for d in range(nl_lhs + NL - 1):
            rows = [limbs[:, d - e] if 0 <= d - e < NL else zeros
                    for e in range(nl_lhs)]
            blocks.append(np.concatenate(rows, axis=-2))
        return np.ascontiguousarray(np.stack(blocks, axis=1))

    w1t = dgroup(np.swapaxes(rescale(plan.w1_limbs), -1, -2), NL)
    w1it = dgroup(np.swapaxes(rescale(plan.w1i_limbs), -1, -2), nl_inv)
    return w1t, w1it, plan


def to_v3_layout(x, k1: int, n: int, n1: int = 128):
    """(B, k1, N) u32 -> (B*k1*N2, 128) rows=(el,poly,i2), lanes=i1."""
    b = x.shape[0]
    n2 = n // n1
    y = x.reshape(b * k1, n1, n2)          # i = i1*N2 + i2
    return jnp.transpose(y, (0, 2, 1)).reshape(b * k1 * n2, n1)


def from_v3_layout(x, b: int, k1: int, n: int, n1: int = 128):
    n2 = n // n1
    y = x.reshape(b * k1, n2, n1)
    return jnp.transpose(y, (0, 2, 1)).reshape(b, k1, n)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _digit_limbs_i8(d_u32):
    """Signed-wrapped u32 digits -> 4 balanced int8 limbs (radix 128)."""
    d = d_u32.astype(jnp.int32)
    limbs = []
    for _ in range(NL):
        le = ((d + 64) & 127) - 64
        limbs.append(le.astype(jnp.int8))
        d = (d - le) >> 7
    return limbs


def _residue_limbs_i8(x_u32, nl: int = NL):
    """Residues (< 2^28 canonical, or < 2^30 lazy with nl=5) -> nl unsigned
    7-bit limbs as int8.

    Mosaic cannot lower u32->i8 directly (its convert helper recurses);
    hop through i32."""
    return [((x_u32 >> U32(LB * e)) & U32(127)).astype(jnp.int32)
            .astype(jnp.int8) for e in range(nl)]


def _fold_diags(diags, p: np.uint32, pinv: np.uint32, fc, signed: bool):
    """7 (or 8) int32 diagonal arrays -> canonical residues u32 < p."""
    t0 = diags[0] + (diags[1] << 7)
    t1 = diags[2] + (diags[3] << 7)
    t2 = diags[4] + (diags[5] << 7)
    t3 = diags[6] if len(diags) == 7 else diags[6] + (diags[7] << 7)
    ts = [t0, t1, t2, t3]
    if signed:
        kp = np.int32(fc["k_p"])
        ts = [(t + kp) for t in ts]
    acc = None
    for k, t in enumerate(ts):
        tu = t.astype(U32) if t.dtype != jnp.uint32 else t
        if k == 0:
            # t0 < 2^31 < 8p: three conditional subtractions beat a REDC
            term = tu
            for m in (4, 2, 1):
                mp = _u32(int(p) * m)
                term = jnp.where(term >= mp, term - mp, term)
        else:
            term = mont_mul32(tu, jnp.full(tu.shape, _u32(fc["cks"][k]), U32),
                              p, pinv)
        acc = term if acc is None else add_mod32(acc, term, p)
    if signed:
        e = _u32(fc["excess"])
        d = acc + U32(p) - e
        acc = jnp.where(d >= U32(p), d - U32(p), d)
    return acc


def _int8_dot(lhs, rhs):
    return jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# Solinas shift-fold: multiply-free diagonal fold for p = 2^28 - a*2^m + 1
# ---------------------------------------------------------------------------
# The VPU emulates 32-bit integer multiplies (mulwide is 4 hardware
# multiplies plus carries), which makes the Montgomery fold the dominant
# cost of the whole kernel (measured by ablation: ~55% of runtime).  The
# MXU primes were chosen pseudo-Fermat so that eps = a*2^m - 1 (a in
# {1,3,5,9}) multiplies by shift-adds only: 2^28 = eps + p ≡ eps (mod p).
#
# Values are tracked as (lo, hi_or_None, upper_bound) triples; hi is None
# while the static bound proves the value fits u32, so no zero-register
# arithmetic is emitted.  All bounds are checked with python ints at trace
# time.


def _sol_shl(v, s: int):
    lo, hi, b = v
    nb = b << s
    if s == 0:
        return v
    if hi is None:
        if nb < (1 << 32):
            return lo << U32(s), None, nb
        return lo << U32(s), lo >> U32(32 - s), nb
    assert nb < (1 << 64)
    return lo << U32(s), (hi << U32(s)) | (lo >> U32(32 - s)), nb


def _sol_add(u, w):
    ulo, uhi, ub = u
    wlo, whi, wb = w
    nb = ub + wb
    assert nb < (1 << 64)
    lo = ulo + wlo
    if uhi is None and whi is None:
        if nb < (1 << 32):
            return lo, None, nb
        return lo, (lo < ulo).astype(U32), nb
    c = (lo < ulo).astype(U32)
    hi = c
    if uhi is not None:
        hi = hi + uhi
    if whi is not None:
        hi = hi + whi
    return lo, hi, nb


def _sol_sub_le(u, w):
    """u - w where w <= u holds value-wise (guaranteed by construction)."""
    ulo, uhi, ub = u
    wlo, whi, wb = w
    lo = ulo - wlo
    if uhi is None and whi is None:
        return lo, None, ub
    brw = (ulo < wlo).astype(U32)
    hi = (uhi if uhi is not None else jnp.zeros_like(ulo)) - brw
    if whi is not None:
        hi = hi - whi
    return lo, hi, ub


def _sol_eps_mul(v, a: int, m: int):
    """v * (a*2^m - 1) via shift-adds; a in {1, 3, 5, 9}."""
    if a == 1:
        av = v
    else:
        av = _sol_add(_sol_shl(v, {3: 1, 5: 2, 9: 3}[a]), v)
    return _sol_sub_le(_sol_shl(av, m), v)


def _sol_split28(v):
    """v -> (v >> 28, v & (2^28-1)); the low part is a u32 triple."""
    lo, hi, b = v
    xl = (lo & U32((1 << 28) - 1), None, (1 << 28) - 1)
    hb = b >> 28
    if hi is None:
        return (lo >> U32(28), None, hb), xl
    xh_lo = (lo >> U32(28)) | (hi << U32(4))
    if hb < (1 << 32):
        return (xh_lo, None, hb), xl
    return (xh_lo, hi >> U32(28), hb), xl


def _fold_diags_solinas(diags, p_int: int, a: int, m: int, signed: bool,
                        dneg: int, dpos: int, lazy: bool = False):
    """7 (or 8) int32 diagonal arrays -> residues u32, without any integer
    multiplies.  dneg/dpos bound each diag: -dneg <= d <= dpos.  With
    lazy=True the result is only guaranteed < 2^30 (skip the final
    reduction round; the consumer takes 5 limbs instead of 4)."""
    t0 = diags[0] + (diags[1] << 7)
    t1 = diags[2] + (diags[3] << 7)
    t2 = diags[4] + (diags[5] << 7)
    t3 = diags[6] if len(diags) == 7 else diags[6] + (diags[7] << 7)
    tpos = dpos * 129
    tneg = dneg * 129
    if signed or tneg:
        off = -(-tneg // p_int) * p_int     # k*p >= tneg: no excess mod p
        assert tneg <= off and tpos + off < (1 << 31)
        ofi = np.int32(off)
        ts = [t0 + ofi, t1 + ofi, t2 + ofi, t3 + ofi]
        tb = tpos + off      # 2p*(1+2^14+2^28+2^42) ≡ 0 mod p: no excess
    else:
        assert tpos < (1 << 31)
        ts = [t0, t1, t2, t3]
        tb = tpos
    u = [(t.astype(U32), None, tb) for t in ts]
    A = _sol_add(u[0], _sol_eps_mul(u[2], a, m))
    B = _sol_add(u[1], _sol_eps_mul(u[3], a, m))
    X = _sol_add(A, _sol_shl(B, 14))
    while X[2] >= (1 << 30):
        xh, xl = _sol_split28(X)
        X = _sol_add(_sol_eps_mul(xh, a, m), xl)
    if lazy:
        lo, hi, b = X
        assert hi is None and b < (1 << 30)
        return lo
    xh, xl = _sol_split28(X)          # xh bound is tiny now
    X = _sol_add(_sol_eps_mul(xh, a, m), xl)
    lo, hi, b = X
    assert hi is None
    acc = lo
    while b >= p_int:
        acc = jnp.where(acc >= U32(p_int), acc - U32(p_int), acc)
        b = max(p_int - 1, b - p_int)
    return acc


def _fold_diags_redc(diags, p_int: int, pinv_neg: int, a: int, m: int,
                     signed: bool, dneg: int, dpos: int, lazy: bool = False):
    """Diagonal fold for Montgomery-domain matrices: shift-assemble the
    ~2^51 redundant value with eps-multiplies, then ONE 32-bit REDC.

    Requires the stage's rhs matrix scaled by 2^32 mod p (mont=True
    tables / bsk builds); the REDC divides it back out.  lazy=True skips
    the final conditional subtraction (result < p + 2^20, 5-limb safe)."""
    t0 = diags[0] + (diags[1] << 7)
    t1 = diags[2] + (diags[3] << 7)
    t2 = diags[4] + (diags[5] << 7)
    t3 = diags[6] if len(diags) == 7 else diags[6] + (diags[7] << 7)
    tpos = dpos * 129
    tneg = dneg * 129
    if signed or tneg:
        off = -(-tneg // p_int) * p_int
        assert tneg <= off and tpos + off < (1 << 31)
        ofi = np.int32(off)
        ts = [t0 + ofi, t1 + ofi, t2 + ofi, t3 + ofi]
        tb = tpos + off
    else:
        assert tpos < (1 << 31)
        ts = [t0, t1, t2, t3]
        tb = tpos
    u = [(t.astype(U32), None, tb) for t in ts]
    # value = (u0 + 2^14 u1) + 2^28 (u2 + 2^14 u3) = L + 2^28 H
    L = _sol_add(u[0], _sol_shl(u[1], 14))
    H = _sol_add(u[2], _sol_shl(u[3], 14))
    hh, hl = _sol_split28(H)
    # 2^28 H = 2^56 hh + 2^28 hl ≡ eps*(eps*hh) + eps*hl (mod p)
    X = _sol_add(L, _sol_add(_sol_eps_mul(hl, a, m),
                             _sol_eps_mul(_sol_eps_mul(hh, a, m), a, m)))
    xlo, xhi, xb = X
    assert xb < p_int << 32, hex(xb)
    mm = xlo * _u32(pinv_neg)
    mp_lo, mp_hi = mulwide(mm, U32(p_int))
    carry = (xlo != U32(0)).astype(U32)      # xlo + mp_lo is 0 or 2^32
    res = mp_hi + carry
    if xhi is not None:
        res = res + xhi
    # res < p + xb/2^32 + 1
    rb = p_int + (xb >> 32) + 1
    if lazy:
        assert rb < (1 << 30)
        return res
    while rb >= p_int:
        res = jnp.where(res >= U32(p_int), res - U32(p_int), res)
        rb = max(p_int - 1, rb - p_int)
    return res


def _garner_acc(res_primes, acc_lo, acc_hi, primes, pinvs, inv_mont, pm_mont,
                prods64, half_digits, p_mod64, num_primes: int,
                round_bits: int, ablate):
    """Garner the per-prime residues to a u64 (lo, hi) pair, scale back by
    2^round_bits (rounded-BSK mode), and add into the accumulator pair.
    Shared by the v3 and v4 kernels (element-wise; layout-agnostic)."""
    if ablate == "gar":
        out_lo = res_primes[0]
        out_hi = res_primes[1]
        for rp in res_primes[2:]:
            out_hi = out_hi ^ rp
    else:
        a_digits = [res_primes[0]]
        for j in range(1, num_primes):
            pj = _u32(primes[j])
            pinv_j = _u32(pinvs[j])
            v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
            for i in range(1, j):
                term = mont_mul32(a_digits[i],
                                  jnp.full(v.shape, _u32(pm_mont[(i - 1, j)]), U32),
                                  pj, pinv_j)
                vv = v + term
                v = jnp.where(vv >= pj, vv - pj, vv)
            r = res_primes[j]
            d = jnp.where(r >= v, r - v, r + pj - v)
            a_digits.append(mont_mul32(
                d, jnp.full(d.shape, _u32(inv_mont[j - 1]), U32), pj, pinv_j))
        out_lo = a_digits[0]
        out_hi = jnp.zeros_like(out_lo)
        for i in range(1, num_primes):
            cc = prods64[i]
            c_lo, c_hi = _u32(cc & 0xFFFFFFFF), _u32((cc >> 32) & 0xFFFFFFFF)
            t_lo, t_hi = mulwide(a_digits[i], jnp.full(out_lo.shape, c_lo, U32))
            t_hi = t_hi + a_digits[i] * c_hi
            out_lo, out_hi = add64(out_lo, out_hi, t_lo, t_hi)
        is_neg = a_digits[0] > _u32(half_digits[0])
        for i in range(1, num_primes):
            hd = _u32(half_digits[i])
            is_neg = (a_digits[i] > hd) | ((a_digits[i] == hd) & is_neg)
        pm_lo, pm_hi = _u32(p_mod64 & 0xFFFFFFFF), _u32((p_mod64 >> 32) & 0xFFFFFFFF)
        corr_lo, corr_hi = sub64(out_lo, out_hi,
                                 jnp.full(out_lo.shape, pm_lo, U32),
                                 jnp.full(out_lo.shape, pm_hi, U32))
        out_lo = jnp.where(is_neg, corr_lo, out_lo)
        out_hi = jnp.where(is_neg, corr_hi, out_hi)

    if round_bits:   # rounded-BSK mode: product = 2^rb * quotient conv
        sh, ish = _u32(round_bits), _u32(32 - round_bits)
        out_hi = (out_hi << sh) | (out_lo >> ish)
        out_lo = out_lo << sh

    if acc_lo is None:   # trunc_acc mode: caller rounds + accumulates hi
        return out_lo, out_hi
    return add64(acc_lo, acc_hi, out_lo, out_hi)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def build_blind_rotate_v3(n: int, base_log: int, levels: int, k1: int,
                          tb: int, n_steps: int, interpret: bool = False,
                          rot_onehot: bool = False, ablate: str | None = None,
                          fold_mode: str = "mont",
                          num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                          round_bits: int = 0):
    """Whole-blind-rotate kernel over the MXU factorization.

    rot_onehot selects the vectorized one-hot rotation (default: unrolled
    per-element dynamic rolls).  ablate ∈ {rot, s1, mid, inv, fold, gar}
    replaces one stage with a data-dependent no-op for per-stage timing —
    results are WRONG under ablation; perf harness use only.  fold_mode is
    "solinas" (multiply-free shift fold; default) or "mont" (Montgomery).

    Caller layout: acc_lo/hi (B*k1*N2, 128) u32 (to_v3_layout); a_rows
    (B*k1*N2, pad128(n_steps)) i32 (per-row rotation degrees, each
    element's degree repeated k1*N2 times, step axis zero-padded to a
    multiple of 128); m_limbs (n_steps, P, L, N1, K, C) int8 from
    mxu.bsk_to_mxu (compact; the kernel assembles the diagonal-grouped
    contraction blocks in VMEM).  Returns (lo, hi) in the same layout.
    """
    n1 = 128
    n2 = n // n1
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    fcs = _fold_consts(n, num_primes)
    # Lazy interfaces under the Solinas/REDC folds: stage outputs stay
    # < 2^30 (final reduction skipped) and the next matmul takes 5 limbs.
    NLS = 4 if fold_mode == "mont" else 5
    ND = NLS + NL - 1            # mid/inv diagonal count
    w1t_np, w1it_np, _ = _kernel_tables(n, NLS, mont=(fold_mode == "redc"),
                                        num_primes=num_primes)
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2           # rows per tile
    kmid = levels * k1 * n2    # middle contraction
    cmid = k1 * n2             # middle output columns

    # pseudo-Fermat decomposition p = 2^28 - a*2^m + 1 for the shift fold
    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_          # eps + 1 = a * 2^m
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))
        assert (ams[-1][0] << m_) == e1 and ams[-1][0] in (1, 3, 5, 9)
    # per-site diag bounds (-dneg..dpos): lhs x rhs over the contraction
    d_s1 = NL * n1 * 64 * 127            # balanced digits x unsigned W limbs
    d_mid = NL * kmid * 127 * 127        # unsigned x unsigned
    d_inv = NL * n1 * 127 * 127

    def kernel(adeg_ref, arow_ref, acc_lo_in, acc_hi_in, m_ref, w1t_ref,
               w1it_ref, out_lo_ref, out_hi_ref, *scr):
        if rot_onehot or ablate == "rot":
            acc_lo_s, acc_hi_s, st_scr, vt_scr = scr
        else:
            acc_lo_s, acc_hi_s, rot_lo_s, rot_hi_s, st_scr, vt_scr = scr
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        acc_lo = acc_lo_s[:]   # (R, 128)
        acc_hi = acc_hi_s[:]

        # ---- rotation: X^a * acc, a = a1*N2 + a2 ------------------------
        # In this layout coeff i = i1*N2 + i2 sits at (row i2, lane i1).
        # X^(N2*a1) is a lane-roll by a1 (sign flips per negacyclic wrap:
        # lane-axis wrap = shift by N); X^(a2) is a roll of the i2 sub-axis
        # with a one-lane borrow for wrapped rows.  Two implementations,
        # both bit-exact: a per-element unrolled loop over dynamic rolls
        # (default; measured faster at tb=64) and a vectorized one-hot
        # select over static rolls (rot_onehot=True).
        if ablate == "rot":
            rot_lo = pltpu.roll(acc_lo, np.int32(1), 1)
            rot_hi = pltpu.roll(acc_hi, np.int32(1), 1)
        elif rot_onehot:
            # per-row shift amounts come in as a 128-step-wide (R, 128)
            # VMEM block (lane-width-1 blocks are rejected); the current
            # step's column is extracted by lane-mask + roll-add reduction.
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            col = jax.lax.rem(s, np.int32(LANES))
            masked = jnp.where(lane2 == col, arow_ref[:], np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a_vec = masked[:, 0:1]                       # (R, 1) i32
            a1v = jax.lax.div(a_vec, np.int32(n2))       # [0, 2N/n2)
            a2v = jax.lax.rem(a_vec, np.int32(n2))
            i2_row = jax.lax.broadcasted_iota(
                jnp.int32, (tb * k1, n2, 1), 1).reshape(R, 1)
            q = a1v + (i2_row < a2v).astype(jnp.int32)   # incl. lane borrow
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            flip = (((lane2 < qm).astype(jnp.int32) + qd) & 1) == 1
            q0 = jax.lax.rem(qm, np.int32(8))
            q1 = jax.lax.div(qm, np.int32(8))

            def rolled(src_ref):
                x3 = src_ref[:].reshape(tb * k1, n2, LANES)
                y = None
                for r in range(n2):                      # i2 sub-axis roll
                    rr = pltpu.roll(x3, np.int32(r), 1).reshape(R, LANES)
                    y = rr if y is None else jnp.where(a2v == r, rr, y)
                z = None
                for r0 in range(8):                      # lane roll, low
                    rr = pltpu.roll(y, np.int32(r0), 1)
                    z = rr if z is None else jnp.where(q0 == r0, rr, z)
                w = None
                for r1 in range(LANES // 8):             # lane roll, high
                    rr = pltpu.roll(z, np.int32(8 * r1), 1)
                    w = rr if w is None else jnp.where(q1 == r1, rr, w)
                return w

            z_lo = rolled(acc_lo_s)
            z_hi = rolled(acc_hi_s)
            n_lo, n_hi = neg64(z_lo, z_hi)   # joint 64-bit negation
            rot_lo = jnp.where(flip, n_lo, z_lo)
            rot_hi = jnp.where(flip, n_hi, z_hi)
        else:
            lane_idx = jax.lax.broadcasted_iota(
                jnp.int32, (k1 * n2, LANES), 1)
            row_i2 = jax.lax.broadcasted_iota(
                jnp.int32, (k1, n2, LANES), 1).reshape(k1 * n2, LANES)
            rows_per_el = k1 * n2

            def rot_body(el, a):
                # `a` is read in an unrolled loop (SMEM scalar reads want
                # static-ish indices)
                a1 = jax.lax.div(a, np.int32(n2))        # [0, 2N/n2)
                a2 = jax.lax.rem(a, np.int32(n2))
                rsl = pl.ds(el * rows_per_el, rows_per_el)
                borrow = row_i2 < a2
                q = jnp.where(borrow, a1 + np.int32(1), a1)
                qm_a = jax.lax.rem(a1, np.int32(LANES))
                qm_b = jax.lax.rem(a1 + np.int32(1), np.int32(LANES))
                flip = (((lane_idx < jax.lax.rem(q, np.int32(LANES)))
                         .astype(jnp.int32) + jax.lax.div(q, np.int32(LANES)))
                        & 1) == 1

                def rolled(src_ref):
                    v3 = src_ref[rsl, :].reshape(k1, n2, LANES)
                    rb = pltpu.roll(v3, a2, 1).reshape(k1 * n2, LANES)
                    za = pltpu.roll(rb, qm_a, 1)
                    zb = pltpu.roll(rb, qm_b, 1)
                    return jnp.where(borrow, zb, za)

                z_lo = rolled(acc_lo_s)
                z_hi = rolled(acc_hi_s)
                n_lo, n_hi = neg64(z_lo, z_hi)   # joint 64-bit negation
                rot_lo_s[rsl, :] = jnp.where(flip, n_lo, z_lo)
                rot_hi_s[rsl, :] = jnp.where(flip, n_hi, z_hi)

            for el in range(tb):
                rot_body(el, adeg_ref[0, 0, t * tb + el])
            rot_lo = rot_lo_s[:]
            rot_hi = rot_hi_s[:]

        ct1_lo, ct1_hi = sub64(rot_lo, rot_hi, acc_lo, acc_hi)
        digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)  # l x (R,128)
        dlimbs = [_digit_limbs_i8(d) for d in digits]            # l x 4 x i8

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(pinvs[pi])
            fc = fcs[pi]

            def fold(diags, signed, dneg, dpos, lazy=False):
                # ablate="fold": data-dependent but trivially cheap stand-in
                if ablate == "fold":
                    return (diags[0] & np.int32((1 << 27) - 1)).astype(U32)
                if fold_mode == "solinas":
                    return _fold_diags_solinas(
                        diags, primes[pi], ams[pi][0], ams[pi][1], signed,
                        dneg, dpos, lazy=lazy)
                if fold_mode == "redc":
                    return _fold_diags_redc(
                        diags, primes[pi], pinvs[pi], ams[pi][0], ams[pi][1],
                        signed, dneg, dpos, lazy=lazy)
                return _fold_diags(diags, p, pinv, fc, signed)

            # ---- stage 1 (fwd): contract lanes (i1) with W1'^T ----------
            # rows (el, poly, i2) keep their meaning; output lanes = k1
            s_levels = []
            for lev in range(levels):
                if ablate == "s1":
                    diags = [dlimbs[lev][0].astype(jnp.int32)] * (2 * NL - 1)
                else:
                    lhs = jnp.concatenate(dlimbs[lev], axis=1)  # (R, L*128)
                    diags = [_int8_dot(lhs, w1t_ref[pi, d])
                             for d in range(2 * NL - 1)]
                s_levels.append(fold(diags, True, d_s1, d_s1, lazy=True))
            # ---- relayout for the middle: St (128 k1, tb, kmid) ---------
            # 2D lane transpose (Mosaic supports it) + static lane-slice
            # writes into scratch (minor-dim SPLITS are unsupported).
            for lev in range(levels):
                stT = jnp.transpose(s_levels[lev])        # (128, R)
                for el in range(tb):
                    st_scr[:, el, lev * k1 * n2:(lev + 1) * k1 * n2] = \
                        stT[:, el * k1 * n2:(el + 1) * k1 * n2]

            # ---- middle: one batched (over k1) int8 dot_general ---------
            stl = _residue_limbs_i8(st_scr[:], NLS)       # NLS x (128,tb,kmid)
            if ablate == "mid":
                diags = [stl[0][:, :, :cmid].astype(jnp.int32)] * ND
            else:
                lhs3 = jnp.concatenate(stl, axis=2)       # (128,tb,NLS*kmid)
                mz = jnp.zeros((n1, kmid, cmid), jnp.int8)
                diags = []
                for d in range(ND):
                    # d-grouped rhs assembled in VMEM from compact tensors
                    rhs = jnp.concatenate(
                        [m_ref[0, pi, d - e] if 0 <= d - e < NL else mz
                         for e in range(NLS)], axis=1)    # (128,NLS*kmid,cmid)
                    diags.append(jax.lax.dot_general(
                        lhs3, rhs,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32))  # (128,tb,cmid)
            v = fold(diags, False, 0, d_mid, lazy=True)   # (128, tb, cmid)

            # ---- inverse stage 1: contract k1 on lanes ------------------
            # relayout V (128 k1, tb, cmid) -> (R rows=(el,c,j2), 128 k1):
            # per-element static lane-slice writes into a (128, R) scratch,
            # then ONE big 2D transpose (64 small transposes measured much
            # slower than one large one)
            for el in range(tb):
                vt_scr[:, el * cmid:(el + 1) * cmid] = v[:, el, :]
            vl = _residue_limbs_i8(jnp.transpose(vt_scr[:]), NLS)  # (R, 128)
            if ablate == "inv":
                diags = [vl[0].astype(jnp.int32)] * ND
            else:
                lhs2 = jnp.concatenate(vl, axis=1)        # (R, NLS*128)
                diags = [_int8_dot(lhs2, w1it_ref[pi, d])  # (R, 128 j1)
                         for d in range(ND)]
            y = fold(diags, False, 0, d_inv)              # (R, 128)
            res_primes.append(y)

        # ---- Garner to u64 pairs + accumulate ---------------------------
        new_lo, new_hi = _garner_acc(
            res_primes, acc_lo, acc_hi, primes, pinvs, inv_mont, pm_mont,
            prods64, half_digits, p_mod64, num_primes, round_bits, ablate)
        acc_lo_s[:] = new_lo
        acc_hi_s[:] = new_hi

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_lo_ref[:] = new_lo
            out_hi_ref[:] = new_hi

    n_steps_pad = -(-n_steps // LANES) * LANES

    def run(acc_lo, acc_hi, adegs, a_rows, m_limbs):
        batch_rows = acc_lo.shape[0]
        assert acc_lo.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        n_tiles = batch_rows // R
        batch = batch_rows // (k1 * n2)
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, batch), lambda t, s: (s, z(t), z(t)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES),
                         lambda t, s: (t, jax.lax.div(s, np.int32(LANES))),
                         memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, num_primes, NL, n1, kmid, cmid),
                         lambda t, s: (s, z(t), z(t), z(t), z(t), z(t)),
                         memory_space=vmem),
            pl.BlockSpec((num_primes, 2 * NL - 1, NL * n1, n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, ND, NLS * n1, n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] *
                           (2 if rot_onehot or ablate == "rot" else 4) +
                           [pltpu.VMEM((n1, tb, kmid), U32),
                            pltpu.VMEM((n1, R), U32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(adegs.reshape(n_steps, 1, batch), a_rows, acc_lo, acc_hi,
                    m_limbs, jnp.asarray(w1t_np), jnp.asarray(w1it_np))

    return run


def blind_rotate_pallas_v3(msed_mask, msed_body, lut, m_limbs, plan,
                           base_log: int, levels: int, tb: int = 8,
                           interpret: bool = False, rot_onehot: bool = False,
                           ablate: str | None = None,
                           fold_mode: str = "mont"):
    """Blind rotation through the v3 MXU kernel; same semantics as
    ops.server.blind_rotate / ops.mxu.blind_rotate_mxu."""
    from .server import monomial_div

    b, k1, n = lut.shape
    n_in = m_limbs.shape[0]
    acc0 = monomial_div(lut, msed_body[:, None, None])
    lo0 = to_v3_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32), k1, n)
    hi0 = to_v3_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n)
    run = build_blind_rotate_v3(n, base_log, levels, k1, tb, n_in, interpret,
                                rot_onehot=rot_onehot, ablate=ablate,
                                fold_mode=fold_mode,
                                num_primes=plan.num_primes,
                                round_bits=plan.round_bits)
    n2 = n // 128
    n_pad = -(-n_in // 128) * 128
    a_rows = jnp.repeat(msed_mask.astype(jnp.int32), k1 * n2, axis=0)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_in)))
    lo, hi = run(lo0, hi0, msed_mask.T.astype(jnp.int32), a_rows, m_limbs)
    lo = from_v3_layout(lo, b, k1, n)
    hi = from_v3_layout(hi, b, k1, n)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


# ---------------------------------------------------------------------------
# v4: aligned-layout kernel — rows (poly, i2, el), packed interfaces
# ---------------------------------------------------------------------------
# The v3 layout puts the batch element OUTERMOST in the row order
# (el, poly, i2), which forces every inter-stage relayout through per-element
# scratch writes and leaves the middle stage on (128, tb, cmid)-shaped
# tensors whose minor dim (cmid = (k+1)*N2 = 32 at the 2_2 family) occupies
# a quarter of the 128 VPU lanes — 4x wasted vector work on the mid fold and
# a 4x padded VMEM footprint (what kept tb=128 from fitting).
#
# v4 reorders rows to (poly, i2, el).  Then:
#   * stage-1 -> mid: ONE 2D transpose of the lazy residues gives
#     (128 k1, R) whose minor order is exactly (kmid, el) — kmid full-width
#     lane-slice copies pack it as (128, kmid, tb) with tb on the lanes;
#   * the mid dot runs transposed (lhs = M^T blocks): out (128, cmid, tb)
#     — tb fills the lanes, so the mid fold runs on fully packed vregs;
#   * mid -> inv: cmid full-width copies + ONE 2D transpose yield rows
#     ((poly, j2), el) — which IS the accumulator row order, so the inverse
#     stage, Garner, and the accumulate need no further relayout.
# Rotation must be the vectorized one-hot variant (per-element row slices
# are strided in this order); it needs no rotation scratch buffers.
# Bit-identical to ops.mxu.blind_rotate_mxu on transpose_middle(m_limbs).


def to_v4_layout(x, k1: int, n: int, tb: int, n1: int = 128):
    """(B, k1, N) u32 -> (B*k1*N2, 128): tile-blocked rows (k1, i2, el),
    lanes i1 (coeff i = i1*N2 + i2)."""
    b = x.shape[0]
    n2 = n // n1
    y = x.reshape(b // tb, tb, k1, n1, n2)
    y = jnp.transpose(y, (0, 2, 4, 1, 3))      # (tiles, k1, n2, el, i1)
    return y.reshape(b * k1 * n2, n1)


def from_v4_layout(x, b: int, k1: int, n: int, tb: int, n1: int = 128):
    n2 = n // n1
    y = x.reshape(b // tb, k1, n2, tb, n1)
    y = jnp.transpose(y, (0, 3, 1, 4, 2))      # (tiles, el, k1, i1, n2)
    return y.reshape(b, k1, n)


@lru_cache(maxsize=None)
def build_blind_rotate_v4(n: int, base_log: int, levels: int, k1: int,
                          tb: int, n_steps: int, interpret: bool = False,
                          ablate: str | None = None,
                          fold_mode: str = "solinas",
                          num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                          round_bits: int = 0):
    """Aligned-layout blind-rotate kernel (see module comment above).

    Caller layout: acc_lo/hi (B*k1*N2, 128) u32 via to_v4_layout; a_rows
    (B*k1*N2, pad128(n_steps)) i32 per-row rotation degrees (row order
    (tile, k1, i2, el) — degree depends only on (tile, el)); m_limbs_t
    (n_steps, P, L, N1, cmid, kmid) int8 from mxu.transpose_middle.
    """
    n1 = 128
    n2 = n // n1
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    fcs = _fold_consts(n, num_primes)
    NLS = 4 if fold_mode == "mont" else 5
    ND = NLS + NL - 1
    w1t_np, w1it_np, _ = _kernel_tables(n, NLS, mont=(fold_mode == "redc"),
                                        num_primes=num_primes)
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2
    kmid = levels * k1 * n2
    cmid = k1 * n2

    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))
        assert (ams[-1][0] << m_) == e1 and ams[-1][0] in (1, 3, 5, 9)
    d_s1 = NL * n1 * 64 * 127
    d_mid = NL * kmid * 127 * 127
    d_inv = NL * n1 * 127 * 127

    def kernel(arow_ref, acc_lo_in, acc_hi_in, m_ref, w1t_ref, w1it_ref,
               out_lo_ref, out_hi_ref, acc_lo_s, acc_hi_s, st_scr, vt_scr):
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        acc_lo = acc_lo_s[:]   # (R, 128) rows (k1, n2, tb)
        acc_hi = acc_hi_s[:]

        # ---- rotation: X^a * acc, one-hot vectorized --------------------
        if ablate == "rot":
            rot_lo = pltpu.roll(acc_lo, np.int32(1), 1)
            rot_hi = pltpu.roll(acc_hi, np.int32(1), 1)
        else:
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            col = jax.lax.rem(s, np.int32(LANES))
            masked = jnp.where(lane2 == col, arow_ref[:], np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a4 = masked[:, 0:1].reshape(k1, n2, tb, 1)   # degree per (tile,el)
            a1v = jax.lax.div(a4, np.int32(n2))          # [0, 2N/n2)
            a2v = jax.lax.rem(a4, np.int32(n2))
            i2r = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, 1), 1)
            q = a1v + (i2r < a2v).astype(jnp.int32)      # incl. lane borrow
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            lane4 = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, LANES), 3)
            flip = (((lane4 < qm).astype(jnp.int32) + qd) & 1) == 1
            q0 = jax.lax.rem(qm, np.int32(8))
            q1 = jax.lax.div(qm, np.int32(8))

            def rolled(src):
                x4 = src.reshape(k1, n2, tb, LANES)
                y = None
                for r in range(n2):                      # i2 sub-axis roll
                    rr = pltpu.roll(x4, np.int32(r), 1)
                    y = rr if y is None else jnp.where(a2v == r, rr, y)
                z = None
                for r0 in range(8):                      # lane roll, low
                    rr = pltpu.roll(y, np.int32(r0), 3)
                    z = rr if z is None else jnp.where(q0 == r0, rr, z)
                w = None
                for r1 in range(LANES // 8):             # lane roll, high
                    rr = pltpu.roll(z, np.int32(8 * r1), 3)
                    w = rr if w is None else jnp.where(q1 == r1, rr, w)
                return w

            z_lo = rolled(acc_lo)
            z_hi = rolled(acc_hi)
            n_lo, n_hi = neg64(z_lo, z_hi)   # joint 64-bit negation
            rot_lo = jnp.where(flip, n_lo, z_lo).reshape(R, LANES)
            rot_hi = jnp.where(flip, n_hi, z_hi).reshape(R, LANES)

        ct1_lo, ct1_hi = sub64(rot_lo, rot_hi, acc_lo, acc_hi)
        digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)  # l x (R,128)
        dlimbs = [_digit_limbs_i8(d) for d in digits]            # l x 4 x i8

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(pinvs[pi])
            fc = fcs[pi]

            def fold(diags, signed, dneg, dpos, lazy=False):
                if ablate == "fold":
                    return (diags[0] & np.int32((1 << 27) - 1)).astype(U32)
                if fold_mode == "solinas":
                    return _fold_diags_solinas(
                        diags, primes[pi], ams[pi][0], ams[pi][1], signed,
                        dneg, dpos, lazy=lazy)
                if fold_mode == "redc":
                    return _fold_diags_redc(
                        diags, primes[pi], pinvs[pi], ams[pi][0], ams[pi][1],
                        signed, dneg, dpos, lazy=lazy)
                return _fold_diags(diags, p, pinv, fc, signed)

            # ---- stage 1 (fwd): contract lanes (i1) with W1'^T ----------
            s_levels = []
            for lev in range(levels):
                if ablate == "s1":
                    diags = [dlimbs[lev][0].astype(jnp.int32)] * (2 * NL - 1)
                else:
                    lhs = jnp.concatenate(dlimbs[lev], axis=1)  # (R, L*128)
                    diags = [_int8_dot(lhs, w1t_ref[pi, d])
                             for d in range(2 * NL - 1)]
                s_levels.append(fold(diags, True, d_s1, d_s1, lazy=True))
            # ---- relayout: ONE 2D transpose per level + full-width packs.
            # stT minor order is (kmid_1, el), so each copy below moves a
            # whole (128, tb) lane-tile block — no sub-width writes.
            for lev in range(levels):
                stT = jnp.transpose(s_levels[lev])        # (128, R)
                base = lev * k1 * n2
                for kk in range(k1 * n2):
                    st_scr[:, base + kk, :] = stT[:, kk * tb:(kk + 1) * tb]

            # ---- middle: transposed dot, tb on the lanes ----------------
            stl = _residue_limbs_i8(st_scr[:], NLS)       # NLS x (128,kmid,tb)
            if ablate == "mid":
                diags = [stl[0][:, :cmid, :].astype(jnp.int32)] * ND
            else:
                rhs3 = jnp.concatenate(stl, axis=1)       # (128,NLS*kmid,tb)
                mz = jnp.zeros((n1, cmid, kmid), jnp.int8)
                diags = []
                for d in range(ND):
                    lhs3 = jnp.concatenate(
                        [m_ref[0, pi, d - e] if 0 <= d - e < NL else mz
                         for e in range(NLS)], axis=2)    # (128,cmid,NLS*kmid)
                    diags.append(jax.lax.dot_general(
                        lhs3, rhs3,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32))  # (128,cmid,tb)
            v = fold(diags, False, 0, d_mid, lazy=True)   # (128, cmid, tb)

            # ---- inverse stage 1: full-width packs + ONE 2D transpose ---
            # vt minor order becomes (cmid, el) = ((poly, j2), el): the
            # transposed rows land directly in the accumulator row order.
            for cc in range(cmid):
                vt_scr[:, cc * tb:(cc + 1) * tb] = v[:, cc, :]
            vl = _residue_limbs_i8(jnp.transpose(vt_scr[:]), NLS)  # (R, 128)
            if ablate == "inv":
                diags = [vl[0].astype(jnp.int32)] * ND
            else:
                lhs2 = jnp.concatenate(vl, axis=1)        # (R, NLS*128)
                diags = [_int8_dot(lhs2, w1it_ref[pi, d])  # (R, 128 j1)
                         for d in range(ND)]
            y = fold(diags, False, 0, d_inv)              # (R, 128)
            res_primes.append(y)

        # ---- Garner to u64 pairs + accumulate ---------------------------
        new_lo, new_hi = _garner_acc(
            res_primes, acc_lo, acc_hi, primes, pinvs, inv_mont, pm_mont,
            prods64, half_digits, p_mod64, num_primes, round_bits, ablate)
        acc_lo_s[:] = new_lo
        acc_hi_s[:] = new_hi

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_lo_ref[:] = new_lo
            out_hi_ref[:] = new_hi

    n_steps_pad = -(-n_steps // LANES) * LANES

    def run(acc_lo, acc_hi, a_rows, m_limbs_t):
        batch_rows = acc_lo.shape[0]
        assert acc_lo.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        n_tiles = batch_rows // R
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((R, LANES),
                         lambda t, s: (t, jax.lax.div(s, np.int32(LANES))),
                         memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, num_primes, NL, n1, cmid, kmid),
                         lambda t, s: (s, z(t), z(t), z(t), z(t), z(t)),
                         memory_space=vmem),
            pl.BlockSpec((num_primes, 2 * NL - 1, NL * n1, n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, ND, NLS * n1, n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] * 2 +
                           [pltpu.VMEM((n1, kmid, tb), U32),
                            pltpu.VMEM((n1, cmid * tb), U32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(a_rows, acc_lo, acc_hi, m_limbs_t,
                    jnp.asarray(w1t_np), jnp.asarray(w1it_np))

    return run


def blind_rotate_pallas_v4(msed_mask, msed_body, lut, m_limbs_t, plan,
                           base_log: int, levels: int, tb: int = 8,
                           interpret: bool = False,
                           ablate: str | None = None,
                           fold_mode: str = "solinas"):
    """Blind rotation through the v4 aligned-layout kernel; same semantics
    as ops.server.blind_rotate / ops.mxu.blind_rotate_mxu.  m_limbs_t is
    mxu.transpose_middle(m_limbs)."""
    from .server import monomial_div

    b, k1, n = lut.shape
    n_in = m_limbs_t.shape[0]
    assert b % tb == 0, (b, tb)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    lo0 = to_v4_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                       k1, n, tb)
    hi0 = to_v4_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n, tb)
    run = build_blind_rotate_v4(n, base_log, levels, k1, tb, n_in, interpret,
                                ablate=ablate, fold_mode=fold_mode,
                                num_primes=plan.num_primes,
                                round_bits=plan.round_bits)
    n2 = n // 128
    n_pad = -(-n_in // 128) * 128
    # rows (tile, k1*n2, el): the degree depends only on (tile, el)
    mi = msed_mask.astype(jnp.int32)
    a_rows = jnp.tile(mi.reshape(b // tb, 1, tb, n_in), (1, k1 * n2, 1, 1))
    a_rows = a_rows.reshape(b * k1 * n2, n_in)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_in)))
    lo, hi = run(lo0, hi0, a_rows, m_limbs_t)
    lo = from_v4_layout(lo, b, k1, n, tb)
    hi = from_v4_layout(hi, b, k1, n, tb)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


# ---------------------------------------------------------------------------
# v5: byte-limb kernel — bitcast pair interfaces, fold work moved to the MXU
# ---------------------------------------------------------------------------
# The fold epilogues (int32 diagonals -> canonical residues -> 7-bit limbs)
# are the measured bottleneck of v3/v4 (~50-70 VPU ops per interface per
# prime).  v5 removes the per-interface modular reduction entirely:
#   * every stage works in radix 2^8 — lhs/rhs limbs are BYTES, so the next
#     stage's input planes come from ONE u32->i8 bitcast (+ XOR centering)
#     instead of shift-extraction, and stage outputs assemble into a
#     redundant u64 PAIR (lo, hi) with a handful of shift-adds (one
#     eps-multiply where the 2^(8d) weight exceeds the pair range);
#   * the pair's hi word rides into the next matmul through a second table
#     family pre-scaled by 2^32 mod p (M32 / W1i32) — trading abundant MXU
#     MACs (x1.4 on mid/inv) for the scarce VPU fold ops;
#   * the XOR centering (s_e = b_e - 128) is exact; its data-independent
#     correction (128 * 0x01010101 * column sums) is precomputed per key
#     (mid) or per table (s1/inv) and pair-added once per stage.
# Only the last interface (into Garner) reduces to canonical residues.
# Bit-exact vs ops.mxu.blind_rotate_mxu on the same key.


def _sol_reduce_canonical(X, a: int, m: int, p_int: int):
    """Redundant triple -> canonical residue < p (solinas eps folding)."""
    while X[2] >= (1 << 30):
        xh, xl = _sol_split28(X)
        X = _sol_add(_sol_eps_mul(xh, a, m), xl)
    xh, xl = _sol_split28(X)
    X = _sol_add(_sol_eps_mul(xh, a, m), xl)
    lo, hi, b = X
    assert hi is None
    acc = lo
    while b >= p_int:
        acc = jnp.where(acc >= U32(p_int), acc - U32(p_int), acc)
        b = max(p_int - 1, b - p_int)
    return acc


def _pair_add_hi(X, XH):
    """X + 2^32 * XH for a pair-triple X and a u32 triple XH (1 VPU add)."""
    lo, hi, b = X
    xh_lo, xh_hi, xh_b = XH
    assert xh_hi is None and hi is not None
    nb = b + (xh_b << 32)
    assert nb < (1 << 64)
    return lo, hi + xh_lo, nb


@lru_cache(maxsize=None)
def _kernel_tables_v5(n: int, num_primes: int, base_log: int):
    """Static v5 tables: byte-diag-grouped stage-1 / inverse matrices and
    the per-row correction sums.

    L1  (P, 6, 128, 4*128) int8 — cols (4*i1+e), e<=2 live (digit byte 3 is
        always zero after the +OFF shift), entry ByteLimb_{d-e}(W1'[k,i]).
    L1i (P, 7, 128, 8*128) int8 — cols [lo-family (4k+e)] ++ [hi-family],
        hi-family = byte limbs of 2^32*W1i mod p.
    s1_sum / inv_sum: integer column sums (python ints) for the corr consts.
    """
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    P = num_primes
    n1 = LANES

    def vals(limbs):
        return sum(limbs[:, e].astype(np.uint64) << np.uint64(LB * e)
                   for e in range(NL))

    w1 = vals(plan.w1_limbs)            # (P, k, i)
    w1i = vals(plan.w1i_limbs)          # (P, j, k)
    ps = np.array(plan.primes, dtype=np.uint64)[:, None, None]
    r32 = np.array([(1 << 32) % p for p in plan.primes],
                   dtype=np.uint64)[:, None, None]
    w1i32 = (w1i * r32) % ps
    bl1 = mxu_mod.byte_limbs_balanced(w1)       # (4, P, k, i)
    bli = mxu_mod.byte_limbs_balanced(w1i)
    bli32 = mxu_mod.byte_limbs_balanced(w1i32)
    L1 = np.zeros((P, 6, n1, 4 * n1), np.int8)
    for d in range(6):
        for e in range(3):
            f = d - e
            if 0 <= f < NL:
                L1[:, d, :, e::4] = bl1[f]
    L1i = np.zeros((P, 7, n1, 8 * n1), np.int8)
    for d in range(7):
        for e in range(4):
            f = d - e
            if 0 <= f < 4:
                L1i[:, d, :, e:4 * n1:4] = bli[f]
                L1i[:, d, :, 4 * n1 + e::4] = bli32[f]
    s1_sum = w1.sum(axis=2).astype(object)            # (P, k) ints
    inv_sum = (w1i.sum(axis=2) + w1i32.sum(axis=2)).astype(object)
    return L1, L1i, s1_sum, inv_sum, plan


@lru_cache(maxsize=None)
def _kernel_tables_v6(n: int, num_primes: int, base_log: int):
    """Static v6 ("j-fold") tables: the data-byte weights 2^(8e) are folded
    INTO the matrix entries before byte-limbing, so each stage emits FOUR
    uniform-weight diagonals (j = matrix byte index) instead of 6/7
    mixed-class ones — the pair assembly collapses to a short 2^(8j)
    weighted chain and the dots shrink by the same 6->4 / 7->4 ratio.

    L1j  (P, 4, 128, 4*128) int8 — col (4*i+e) of diag j holds
         byte_j(2^(8e) * W1'[k,i] mod p), e<=2 live;
    L1ij (P, 4, 128, 8*128) — cols [lo-family (4i+e)] ++ [hi-family], the
         hi family folds the pair's 2^32 weight as in v5.
    s1w_sum / s1j_sum / invj_sum: integer column sums for the corrections
    (true value = sum_e W_e * s_e + 128 * sum_e W_e - OFF * sum W1 mod p,
    s_e the XOR-centered data bytes).
    """
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    P = num_primes
    n1 = LANES

    def vals(limbs):
        return sum(limbs[:, e].astype(np.uint64) << np.uint64(LB * e)
                   for e in range(NL))

    w1 = vals(plan.w1_limbs)            # (P, k, i)
    w1i = vals(plan.w1i_limbs)
    ps = np.array(plan.primes, dtype=np.uint64)[:, None, None]
    r32 = np.array([(1 << 32) % p for p in plan.primes],
                   dtype=np.uint64)[:, None, None]
    w1i32 = (w1i * r32) % ps
    L1j = np.zeros((P, 4, n1, 4 * n1), np.int8)
    s1j_sum = np.zeros((P, n1), dtype=object)
    for e in range(3):
        we = (w1 << np.uint64(8 * e)) % ps          # 2^(8e) W1 mod p
        ble = mxu_mod.byte_limbs_balanced(we)       # (4, P, k, i)
        for j in range(4):
            L1j[:, j, :, e::4] = ble[j]
        s1j_sum += we.sum(axis=2).astype(object)
    L1ij = np.zeros((P, 4, n1, 8 * n1), np.int8)
    invj_sum = np.zeros((P, n1), dtype=object)
    for e in range(4):
        for fam, w in enumerate((w1i, w1i32)):
            we = (w << np.uint64(8 * e)) % ps
            ble = mxu_mod.byte_limbs_balanced(we)
            for j in range(4):
                L1ij[:, j, :, fam * 4 * n1 + e:(fam + 1) * 4 * n1:4] = ble[j]
            invj_sum += we.sum(axis=2).astype(object)
    s1w_sum = w1.sum(axis=2).astype(object)         # (P, k) ints
    return L1j, L1ij, s1w_sum, s1j_sum, invj_sum, plan


def _weights_and_asm(bounds, a_, m_, hi_ds, eps_ds):
    """Returns (weights list, assemble fn).  d in hi_ds go through the
    u32 hi-word chain (exact weight 2^(8d)); d in eps_ds go through
    eps-folding (exact weight eps * 2^(8d-28)).

    Adjacent same-class diagonals (d, d+1) whose combined bound fits
    int31 are pre-combined in ONE int32 value dg_d + 256*dg_{d+1}
    (their weight ratio is exactly 256 within a class), halving the
    offset-adds and pair-chain links of the assembly; the offset
    b_d + 256*b_{d+1} at weight w_d contributes w_d*b_d + w_{d+1}*
    b_{d+1}, so the compensation constant is unchanged."""
    eps = a_ * (1 << m_) - 1
    n_d = len(bounds)
    ws = [(eps << (8 * d - 28)) if d in eps_ds else (1 << (8 * d))
          for d in range(n_d)]

    def cls(d):
        return 2 if d in eps_ds else 1 if d in hi_ds else 0

    groups = []                       # (d, paired) — static plan
    d = 0
    while d < n_d:
        if (d + 1 < n_d and cls(d) == cls(d + 1)
                and bounds[d] + 256 * bounds[d + 1] < (1 << 31)):
            groups.append((d, True))
            d += 2
        else:
            groups.append((d, False))
            d += 1

    def asm(diags, corr_vec, corr_bound):
        X = None
        XH = None
        for d, paired in groups:
            if paired:
                dg = diags[d] + (diags[d + 1] << np.int32(8))
                bd = bounds[d] + 256 * bounds[d + 1]
            else:
                dg = diags[d]
                bd = bounds[d]
            u = ((dg + np.int32(bd)).astype(U32), None, 2 * bd)
            c = cls(d)
            if c == 2:
                t = _sol_shl(_sol_eps_mul(u, a_, m_), 8 * d - 28)
                X = t if X is None else _sol_add(X, t)
            elif c == 1:
                t = u if d == hi_ds[0] else _sol_shl(
                    u, 8 * (d - hi_ds[0]))
                XH = t if XH is None else _sol_add(XH, t)
            else:
                t = u if d == 0 else _sol_shl(u, 8 * d)
                X = t if X is None else _sol_add(X, t)
        X = _sol_add(X, (corr_vec, None, corr_bound))
        if X[1] is None:
            X = (X[0], jnp.zeros_like(X[0]), X[2])
        if XH is not None:
            assert XH[1] is None
            X = _pair_add_hi(X, XH)
        return X

    comp = sum(w * b for w, b in zip(ws, bounds))
    return ws, asm, comp


@lru_cache(maxsize=None)
def build_blind_rotate_v5(n: int, base_log: int, levels: int, k1: int,
                          tb: int, n_steps: int, interpret: bool = False,
                          ablate: str | None = None,
                          num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                          round_bits: int = 0, jfold: bool = False,
                          trunc_acc: bool = False):
    """Byte-limb blind-rotate kernel (see section comment above).

    Caller layout identical to v4 (to_v4_layout rows (k1, i2, el), lanes
    i1); v32 (reverse-byte-packed u32 middle words) / corr from
    mxu.bsk_to_mxu_v5 (+ device build).

    jfold=True is the "v6" variant: the static stage-1/inverse tables carry
    the data-byte weights 2^(8e) pre-multiplied mod p (_kernel_tables_v6),
    so those stages emit FOUR uniform-weight diagonals instead of 6/7
    mixed-class ones — ~2/3 / ~4/7 of the dot work and a much shorter pair
    assembly.  The mid stage (per-step key tensors — folding there would 4x
    their memory) is unchanged.

    trunc_acc=True is the "v7" variant: the accumulator keeps only its TOP
    32 bits (each step's external product is rounded to the 2^32 grid
    before accumulating) — the low bits sit far below the noise floor, the
    per-step rounding adds ~2^78 to the output variance at 2_2 (budget
    2^107.5; tests/test_trunc_acc.py), and rotation/accumulate run on ONE
    u32 word instead of a pair.  Semantics = ops.mxu.blind_rotate_mxu_trunc
    (bit-exact parity-tested); requires a delta-aligned LUT (low word 0).
    """
    assert base_log <= 23, "v5 digit bytes assume base_log <= 23"
    n1 = LANES
    n2 = n // n1
    if jfold:
        L1_np, L1i_np, s1w_sum, s1j_sum, invj_sum, plan = _kernel_tables_v6(
            n, num_primes, base_log)
    else:
        L1_np, L1i_np, s1_sum, inv_sum, plan = _kernel_tables_v5(
            n, num_primes, base_log)
    nd_s1, nd_inv = (4, 4) if jfold else (6, 7)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2
    kmid = levels * k1 * n2
    cmid = k1 * n2

    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))

    OFF = 1 << (base_log - 1)
    XORC = np.uint32(0x80808080)
    CENT3 = 128 * 0x010101
    CENT4 = 128 * 0x01010101

    # ---- per-diag |bound|s (python ints; asserted into offsets) ----------
    if jfold:
        # j-fold: every diagonal j sums ALL live columns (3 data bytes for
        # s1; 4 bytes x 2 families for inv), |byte|<=128, |s_e|<=128
        b_s1 = [3 * n1 * 128 * 128] * 4
        b_inv = [8 * n1 * 128 * 128] * 4
    else:
        # s1: cols per (e,f) pair = 128; |s_e|<=128, |limb|<=128
        live_s1 = [len([1 for e in range(3) for f in range(NL) if e + f == d])
                   for d in range(6)]
        b_s1 = [lv * n1 * 128 * 128 for lv in live_s1]
        # inv: cols per (e,f) = 128, two families
        live_i = [len([1 for e in range(4) for f in range(4) if e + f == d])
                  for d in range(7)]
        b_inv = [2 * lv * n1 * 128 * 128 for lv in live_i]
    # mid: cols per (e,f) = kmid, two families (jfold-independent)
    live_m = [len([1 for e in range(4) for f in range(4) if e + f == d])
              for d in range(7)]
    b_mid = [2 * lv * kmid * 128 * 128 for lv in live_m]

    # (pair-assembly planner hoisted to module level: _weights_and_asm)

    # static per-prime assembly plans + correction constants
    s1_asm, mid_asm, inv_asm = [], [], []
    corr1_np = np.zeros((num_primes, n1, LANES), np.uint32)
    corri_np = np.zeros((num_primes, n1, LANES), np.uint32)
    mid_const = []
    for pi, p_ in enumerate(primes):
        a_, m_ = ams[pi]
        ws1, asm1, comp1 = _weights_and_asm(
            b_s1, a_, m_, *(([], []) if jfold else ([4, 5], [])))
        wsm, asmm, compm = _weights_and_asm(b_mid, a_, m_, [4, 5], [6])
        wsi, asmi, compi = _weights_and_asm(
            b_inv, a_, m_, *(([], []) if jfold else ([4], [5, 6])))
        s1_asm.append(asm1)
        mid_asm.append(asmm)
        inv_asm.append(asmi)
        for k in range(n1):
            if jfold:
                c = (128 * int(s1j_sum[pi, k])
                     - OFF * int(s1w_sum[pi, k]) - comp1) % p_
                ci = (128 * int(invj_sum[pi, k]) - compi) % p_
            else:
                c = (-((OFF - CENT3) * int(s1_sum[pi, k]) + comp1)) % p_
                ci = (CENT4 * int(inv_sum[pi, k]) - compi) % p_
            corr1_np[pi, k, :] = c
            corri_np[pi, k, :] = ci
        mid_const.append((-compm) % p_)

    d_pad = -(-4 * n1 // LANES) * LANES      # = 4*128 (already aligned)

    # static lane tables for the tiled-V diagonal shifts in the mid stage
    # (passed as kernel inputs — Pallas rejects captured array constants):
    # lane l of the 8x-repeated V belongs to diagonal blk = l // cmid and is
    # byte-shifted by 8*(3-blk) down (blk <= 3) or 8*(blk-3) up (blk > 3);
    # block 7 is sliced away after the dot, so its garbage needs no zeroing.
    _blk = np.arange(8 * cmid) // cmid
    SHD_NP = (8 * np.maximum(3 - _blk, 0)).astype(np.uint32)[None, None, :]
    SHU_NP = (8 * np.maximum(_blk - 3, 0)).astype(np.uint32)[None, None, :]

    def kernel(arow_ref, acc_lo_in, acc_hi_in, m_ref, cm_ref, L1_ref,
               L1i_ref, c1_ref, ci_ref, shd_ref, shu_ref,
               out_lo_ref, out_hi_ref,
               acc_lo_s, acc_hi_s, st_lo_s, st_hi_s, vt_lo_s, vt_hi_s):
        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            if not trunc_acc:
                acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        acc_lo = None if trunc_acc else acc_lo_s[:]
        acc_hi = acc_hi_s[:]

        # ---- rotation (identical to v4; hi word only under trunc_acc) ---
        if ablate == "rot":
            rot_lo = None if trunc_acc else pltpu.roll(acc_lo, np.int32(1), 1)
            rot_hi = pltpu.roll(acc_hi, np.int32(1), 1)
        else:
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            col = jax.lax.rem(s, np.int32(LANES))
            masked = jnp.where(lane2 == col, arow_ref[:], np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a4 = masked[:, 0:1].reshape(k1, n2, tb, 1)
            a1v = jax.lax.div(a4, np.int32(n2))
            a2v = jax.lax.rem(a4, np.int32(n2))
            i2r = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, 1), 1)
            q = a1v + (i2r < a2v).astype(jnp.int32)
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            lane4 = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, LANES), 3)
            flip = (((lane4 < qm).astype(jnp.int32) + qd) & 1) == 1

            def rolled(src):
                # binary ladder: conditional roll by 2^b per shift bit —
                # 4 + 7 roll+selects instead of the 16 + 8 + 16 of the
                # one-per-option ladders (rolls by powers of two compose)
                y = src.reshape(k1, n2, tb, LANES)
                for b in range(n2.bit_length() - 1):
                    rr = pltpu.roll(y, np.int32(1 << b), 1)
                    y = jnp.where((a2v >> b) & 1 == 1, rr, y)
                for b in range(7):
                    rr = pltpu.roll(y, np.int32(1 << b), 3)
                    y = jnp.where((qm >> b) & 1 == 1, rr, y)
                return y

            z_hi = rolled(acc_hi)
            if trunc_acc:
                # value = hi * 2^32: negation is a plain u32 negate
                rot_lo = None
                rot_hi = jnp.where(flip, jnp.zeros_like(z_hi) - z_hi,
                                   z_hi).reshape(R, LANES)
            else:
                z_lo = rolled(acc_lo)
                n_lo, n_hi = neg64(z_lo, z_hi)
                rot_lo = jnp.where(flip, n_lo, z_lo).reshape(R, LANES)
                rot_hi = jnp.where(flip, n_hi, z_hi).reshape(R, LANES)

        if trunc_acc:
            ct1_hi = rot_hi - acc_hi
            digits = _decompose32(jnp.zeros_like(ct1_hi), ct1_hi,
                                  base_log, levels)
        else:
            ct1_lo, ct1_hi = sub64(rot_lo, rot_hi, acc_lo, acc_hi)
            digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)
        # digit planes: transpose + offset + XOR + bitcast (per level)
        dxs = []
        for lev in range(levels):
            if ablate == "dpl":   # front-end ablation: rot+dec+planes all
                dT = st_lo_s[:].reshape(n1, R)   # DCE'd via this scratch read
            else:
                dT = jnp.transpose(digits[lev]) + U32(OFF)   # (128 i1, R)
            dxs.append(pltpu.bitcast(dT ^ XORC, jnp.int8))   # (4*128, R)

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])

            # ---- stage 1: byte dots + pair assembly ---------------------
            for lev in range(levels):
                if ablate == "s1":
                    diags = [dxs[lev][:n1].astype(jnp.int32)] * nd_s1
                else:
                    diags = [jax.lax.dot_general(
                        L1_ref[pi, d], dxs[lev], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                        for d in range(nd_s1)]
                if ablate == "s1a":   # skip pair assembly + st packing
                    st_lo_s[:, 0, :] = diags[0][:, :tb].astype(U32)
                    st_hi_s[:, 0, :] = diags[1][:, :tb].astype(U32)
                    continue
                Xlo, Xhi, xb = s1_asm[pi](diags, c1_ref[pi][:, :1],
                                          primes[pi] - 1)
                assert (xb >> 32) < (1 << 31)
                base = lev * k1 * n2
                for kk in range(k1 * n2):
                    st_lo_s[:, base + kk, :] = Xlo[:, kk * tb:(kk + 1) * tb]
                    st_hi_s[:, base + kk, :] = Xhi[:, kk * tb:(kk + 1) * tb]

            # ---- middle: two-family byte dot ----------------------------
            # rhs: bitcast interleaves (kk, byte) along the second-minor
            # axis; family blocks concatenated -> contraction index
            # fam*4*kmid + kk*4 + e, matching the packed-u32 lhs below.
            r_lo = pltpu.bitcast(st_lo_s[:] ^ XORC, jnp.int8)  # (128,4kmid,tb)
            r_hi = pltpu.bitcast(st_hi_s[:] ^ XORC, jnp.int8)
            rhs = jnp.concatenate([r_lo, r_hi], axis=1)     # (128, 8kmid, tb)
            if ablate == "mid":
                diags = [rhs[:, :cmid, :].astype(jnp.int32)] * 7
            else:
                # Diagonal-d lhs = ONE u32 byte-shift of the reverse-byte-
                # packed middle words (mxu._pack_v5_bytes_np): byte e of
                # V >> 8*(3-d) (d<=3) / V << 8*(d-3) is digit (d-e), with
                # zero-fill exactly where the grouping needs zeros; bitcast
                # reinterprets the shifted words as (kk, byte)-interleaved
                # int8 rows, and the dot contracts the second-minor axis of
                # BOTH operands (Mosaic-legal, unlike an int8 minor-dim
                # insertion).  All 7 diagonals ride ONE batched dot with the
                # d-axis on the lanes (M = 8*cmid): 7 separate M=cmid dots
                # leave the MXU ~1/8 utilized and their issue overhead
                # dominated the kernel (174 ms of 514, V5_ABLATE=mid).  The
                # stacked lhs is built by pltpu.repeat-tiling V 8x on the
                # lanes and shifting each 32-lane block by its own amount
                # via lane-varying vector shifts (a 7-piece lane concat of
                # the shifted blocks miscompiles on Mosaic — block d=5 came
                # back corrupted — while repeat + variable shifts is probed
                # bit-exact; see perf_harness/_t_v5_probe*.py).
                v_pack = m_ref[0, pi]                 # (128, 2kmid, cmid) u32
                if ablate == "mlb":   # skip the repeat + variable shifts
                    w_all = jnp.broadcast_to(v_pack[:, :, :1],
                                             (n1, 2 * kmid, 8 * cmid))
                else:
                    tiled = pltpu.repeat(v_pack, 8, 2)  # (128, 2kmid, 8cmid)
                    w_all = (tiled >> shd_ref[:]) << shu_ref[:]
                lhs = pltpu.bitcast(w_all, jnp.int8)  # (128, 8kmid, 8*cmid)
                out = jax.lax.dot_general(
                    lhs, rhs,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)  # (128, 8*cmid, tb)
                diags = [out[:, d * cmid:(d + 1) * cmid, :]
                         for d in range(7)]
            if ablate == "mida":   # skip mid pair assembly + vt packing
                vt_lo_s[:, :tb] = diags[0][:, 0, :].astype(U32)
                vt_hi_s[:, :tb] = diags[1][:, 0, :].astype(U32)
            else:
                cmv = (cm_ref[0, pi] + U32(mid_const[pi]))[:, :, None]
                Vlo, Vhi, vb = mid_asm[pi](diags, cmv, 2 * (primes[pi] - 1))
                assert (vb >> 32) < (1 << 31)
                for cc in range(cmid):
                    vt_lo_s[:, cc * tb:(cc + 1) * tb] = Vlo[:, cc, :]
                    vt_hi_s[:, cc * tb:(cc + 1) * tb] = Vhi[:, cc, :]

            # ---- inverse stage: two-family byte dot ---------------------
            rv = jnp.concatenate(
                [pltpu.bitcast(vt_lo_s[:] ^ XORC, jnp.int8),
                 pltpu.bitcast(vt_hi_s[:] ^ XORC, jnp.int8)], axis=0)
            if ablate == "inv":
                diags = [rv[:n1].astype(jnp.int32)] * nd_inv
            else:
                # one M=nd*n1 dot instead of nd M=n1 dots (same
                # issue-overhead argument as the mid stage; the table is
                # static so the stacking is a free row-major reshape)
                lhs_i = L1i_ref[pi].reshape(nd_inv * n1, 8 * n1)
                y_all = jax.lax.dot_general(
                    lhs_i, rv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)   # (nd*n1, cmid*tb)
                diags = [y_all[d * n1:(d + 1) * n1] for d in range(nd_inv)]
            if ablate == "inva":   # skip inv pair assembly + canonicalize
                y = pltpu.bitcast(diags[0], U32)
            else:
                Y = inv_asm[pi](diags, ci_ref[pi][:, :1], primes[pi] - 1)
                # pair -> canonical: lo + 2^4*eps*hi (2^32 = 2^4*2^28 mod p)
                a_, m_ = ams[pi]
                ylo, yhi, yb = Y
                H = (yhi, None, yb >> 32)
                Z = _sol_add((ylo, None, min(yb, (1 << 32) - 1)),
                             _sol_shl(_sol_eps_mul(H, a_, m_), 4))
                y = _sol_reduce_canonical(Z, a_, m_, primes[pi])
            res_primes.append(jnp.transpose(y))             # (R, 128)

        if trunc_acc:
            out_lo, out_hi = _garner_acc(
                res_primes, None, None, primes, pinvs, inv_mont, pm_mont,
                prods64, half_digits, p_mod64, num_primes, round_bits,
                ablate)
            # round the EP output to the 2^32 grid and accumulate the hi
            new_hi = acc_hi + out_hi + (out_lo >> U32(31))
            acc_hi_s[:] = new_hi

            @pl.when(s == pl.num_programs(1) - 1)
            def _():
                out_hi_ref[:] = new_hi
        else:
            new_lo, new_hi = _garner_acc(
                res_primes, acc_lo, acc_hi, primes, pinvs, inv_mont, pm_mont,
                prods64, half_digits, p_mod64, num_primes, round_bits, ablate)
            acc_lo_s[:] = new_lo
            acc_hi_s[:] = new_hi

            @pl.when(s == pl.num_programs(1) - 1)
            def _():
                out_lo_ref[:] = new_lo
                out_hi_ref[:] = new_hi

    n_steps_pad = -(-n_steps // LANES) * LANES

    def run(acc_lo, acc_hi, a_rows, v32, corr_mid):
        batch_rows = acc_lo.shape[0]
        assert acc_lo.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        n_tiles = batch_rows // R
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((R, LANES),
                         lambda t, s: (t, jax.lax.div(s, np.int32(LANES))),
                         memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, 2 * kmid, cmid),
                         lambda t, s: (s,) + (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, cmid),
                         lambda t, s: (s,) + (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((num_primes, nd_s1, n1, 4 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, nd_inv, n1, 8 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, n1, LANES),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((num_primes, n1, LANES),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] * 2 +
                           [pltpu.VMEM((n1, kmid, tb), U32)] * 2 +
                           [pltpu.VMEM((n1, cmid * tb), U32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(a_rows, acc_lo, acc_hi, v32, corr_mid,
                    jnp.asarray(L1_np), jnp.asarray(L1i_np),
                    jnp.asarray(corr1_np), jnp.asarray(corri_np),
                    jnp.asarray(SHD_NP), jnp.asarray(SHU_NP))

    return run


def blind_rotate_pallas_v5(msed_mask, msed_body, lut, v32, corr_mid, plan,
                           base_log: int, levels: int, tb: int = 8,
                           interpret: bool = False,
                           ablate: str | None = None, jfold: bool = False,
                           trunc_acc: bool = False):
    """Blind rotation through the v5 byte-limb kernel; same semantics as
    ops.mxu.blind_rotate_mxu.  v32/corr_mid from mxu.bsk_to_mxu_v5.
    jfold=True selects the v6 weight-folded stage tables; trunc_acc=True
    the v7 truncated accumulator (= ops.mxu.blind_rotate_mxu_trunc)."""
    from .server import monomial_div

    b, k1, n = lut.shape
    n_in = v32.shape[0]
    assert b % tb == 0, (b, tb)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    if trunc_acc:
        # delta-aligned LUTs have zero low words; round defensively anyway
        acc0 = (acc0 + np.uint64(1 << 31)) & np.uint64(0xFFFFFFFF00000000)
    lo0 = to_v4_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                       k1, n, tb)
    hi0 = to_v4_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n, tb)
    run = build_blind_rotate_v5(n, base_log, levels, k1, tb, n_in, interpret,
                                ablate=ablate, num_primes=plan.num_primes,
                                round_bits=plan.round_bits, jfold=jfold,
                                trunc_acc=trunc_acc)
    n2 = n // 128
    n_pad = -(-n_in // 128) * 128
    mi = msed_mask.astype(jnp.int32)
    a_rows = jnp.tile(mi.reshape(b // tb, 1, tb, n_in), (1, k1 * n2, 1, 1))
    a_rows = a_rows.reshape(b * k1 * n2, n_in)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_in)))
    lo, hi = run(lo0, hi0, a_rows, v32, corr_mid)
    hi = from_v4_layout(hi, b, k1, n, tb)
    if trunc_acc:        # the lo output buffer is never written in v7 mode
        return hi.astype(jnp.uint64) << np.uint64(32)
    lo = from_v4_layout(lo, b, k1, n, tb)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


# ---------------------------------------------------------------------------
# v8: macro-step kernel — deferred s1 assembly, REDC inverse, ss-step blocks
# ---------------------------------------------------------------------------
# Three changes over v7 (all bit-exact vs ops.mxu.blind_rotate_mxu[_trunc]):
#   * DEFERRED S1 ASSEMBLY: the jfold s1 stage's four uniform diagonals are
#     combined into just TWO offset words dgA = d0 + 2^8 d1 + OFFS and
#     dgB = d2 + 2^8 d3 + OFFS (4 VPU ops) instead of a full pair chain with
#     corrections; the mid matmul's second family becomes 2^16*M (was
#     2^32*M), and the s1 correction c1(k1) + offset compensation ride the
#     per-step corr tensor (mxu._v8_consts) — the s1 epilogue, ~20% of the
#     v6 step budget, all but disappears.
#   * REDC INVERSE: the inverse stage's static tables are pre-scaled by
#     2^32; ONE 32-bit REDC replaces the eps-fold canonicalization chain of
#     the assembled pair (~half the inv epilogue).
#   * MACRO-STEPS: `ss` consecutive blind-rotate steps run per grid
#     iteration, and their key blocks are packed on the lane axis
#     (mxu.bsk_to_mxu_v8): minor dim ss*C = 128, so the HBM (8,128) tiling
#     pads NOTHING — the v5 layout's C=32 minor wasted 4x HBM capacity and
#     DMA bandwidth (the round-3 decompression OOM, VERDICT r3 weak #3) —
#     and the per-grid-step pipeline overhead is paid ss times less often.


@lru_cache(maxsize=None)
def _kernel_tables_v8(n: int, num_primes: int, base_log: int):
    """v8 static tables: jfold s1 tables (identical to v6's L1j) and inverse
    tables whose two families are pre-scaled by 2^32 (REDC finishing):
    L1ij32 (P, 4, 128, 8*128) with families (2^32*W1i, 2^64*W1i) mod p, plus
    the inverse centering sums for the correction constants."""
    plan = mxu_mod.make_mxu_plan(n, num_primes=num_primes)
    P = num_primes
    n1 = LANES

    def vals(limbs):
        return sum(limbs[:, e].astype(np.uint64) << np.uint64(LB * e)
                   for e in range(NL))

    w1 = vals(plan.w1_limbs)
    w1i = vals(plan.w1i_limbs)
    ps = np.array(plan.primes, dtype=np.uint64)[:, None, None]
    r32 = np.array([(1 << 32) % p for p in plan.primes],
                   dtype=np.uint64)[:, None, None]
    r64 = np.array([pow(2, 64, int(p)) for p in plan.primes],
                   dtype=np.uint64)[:, None, None]
    w1i32 = (w1i * r32) % ps
    w1i64 = (w1i32 * r32) % ps
    assert ((w1i.astype(object) * (1 << 64)) % ps.astype(object)
            == w1i64.astype(object)).all()
    del r64
    L1j = np.zeros((P, 4, n1, 4 * n1), np.int8)
    for e in range(3):
        we = (w1 << np.uint64(8 * e)) % ps
        ble = mxu_mod.byte_limbs_balanced(we)
        for j in range(4):
            L1j[:, j, :, e::4] = ble[j]
    L1ij32 = np.zeros((P, 4, n1, 8 * n1), np.int8)
    invj_sum = np.zeros((P, n1), dtype=object)
    for e in range(4):
        for fam, w in enumerate((w1i32, w1i64)):
            we = (w << np.uint64(8 * e)) % ps
            ble = mxu_mod.byte_limbs_balanced(we)
            for j in range(4):
                L1ij32[:, j, :, fam * 4 * n1 + e:(fam + 1) * 4 * n1:4] = ble[j]
            invj_sum += we.sum(axis=2).astype(object)
    return L1j, L1ij32, invj_sum, plan


@lru_cache(maxsize=None)
def build_blind_rotate_v8(n: int, base_log: int, levels: int, k1: int,
                          tb: int, n_steps: int, interpret: bool = False,
                          ablate: str | None = None,
                          num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                          round_bits: int = 0, trunc_acc: bool = True,
                          ss: int = 4):
    """Macro-step blind-rotate kernel (see section comment above).

    Caller layout: acc via to_v4_layout; a_rows as v5; (v32, corr) from
    mxu.bsk_to_mxu_v8 / middle_v8_from_eval_device with the same `ss`.
    n_steps is the REAL step count; the grid runs ceil(n_steps/ss) macro
    steps and the zero-padded tail sub-steps are exact no-ops.
    """
    assert base_log <= 23 and 128 % ss == 0
    n1 = LANES
    n2 = n // n1
    L1_np, L1i_np, invj_sum, plan = _kernel_tables_v8(n, num_primes, base_log)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2
    kmid = levels * k1 * n2
    cmid = k1 * n2

    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))

    OFF = 1 << (base_log - 1)
    XORC = np.uint32(0x80808080)
    _, OFFS = mxu_mod._v8_consts(plan, base_log)

    # bounds: s1 diags (jfold, 3 live data bytes), mid (2 fams x 4 bytes),
    # inv (2 fams x 4 bytes, uniform jfold diagonals)
    b_inv = [8 * n1 * 128 * 128] * 4
    live_m = [len([1 for e in range(4) for f in range(4) if e + f == d])
              for d in range(7)]
    b_mid = [2 * lv * kmid * 128 * 128 for lv in live_m]

    mid_asm, inv_asm = [], []
    corri_np = np.zeros((num_primes, n1, LANES), np.uint32)
    mid_const = []
    for pi, p_ in enumerate(primes):
        a_, m_ = ams[pi]
        wsm, asmm, compm = _weights_and_asm(b_mid, a_, m_, [4, 5], [6])
        wsi, asmi, compi = _weights_and_asm(b_inv, a_, m_, [], [])
        mid_asm.append(asmm)
        inv_asm.append(asmi)
        for k in range(n1):
            corri_np[pi, k, :] = (128 * int(invj_sum[pi, k]) - compi) % p_
        mid_const.append((-compm) % p_)

    _blk = np.arange(8 * cmid) // cmid
    SHD_NP = (8 * np.maximum(3 - _blk, 0)).astype(np.uint32)[None, None, :]
    SHU_NP = (8 * np.maximum(_blk - 3, 0)).astype(np.uint32)[None, None, :]

    n_macro = -(-n_steps // ss)
    sub_per_block = LANES // ss   # macro steps per 128-wide a-row block

    def kernel(arow_ref, acc_lo_in, acc_hi_in, m_ref, cm_ref, L1_ref,
               L1i_ref, ci_ref, shd_ref, shu_ref,
               out_lo_ref, out_hi_ref,
               acc_lo_s, acc_hi_s, st_lo_s, st_hi_s, vt_lo_s, vt_hi_s):
        t = pl.program_id(0)
        sM = pl.program_id(1)

        @pl.when(sM == 0)
        def _():
            if not trunc_acc:
                acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        for j in range(ss):
            _substep(j, t, sM, arow_ref, m_ref, cm_ref, L1_ref, L1i_ref,
                     ci_ref, shd_ref, shu_ref, acc_lo_s, acc_hi_s,
                     st_lo_s, st_hi_s, vt_lo_s, vt_hi_s)

        @pl.when(sM == pl.num_programs(1) - 1)
        def _():
            if not trunc_acc:
                out_lo_ref[:] = acc_lo_s[:]
            out_hi_ref[:] = acc_hi_s[:]

    def _substep(j, t, sM, arow_ref, m_ref, cm_ref, L1_ref, L1i_ref, ci_ref,
                 shd_ref, shu_ref, acc_lo_s, acc_hi_s, st_lo_s, st_hi_s,
                 vt_lo_s, vt_hi_s):
        acc_lo = None if trunc_acc else acc_lo_s[:]
        acc_hi = acc_hi_s[:]

        # ---- rotation (v5's binary-ladder one-hot) ----------------------
        if ablate == "rot":
            rot_lo = None if trunc_acc else pltpu.roll(acc_lo, np.int32(1), 1)
            rot_hi = pltpu.roll(acc_hi, np.int32(1), 1)
        else:
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            col = jax.lax.rem(sM, np.int32(sub_per_block)) * np.int32(ss) \
                + np.int32(j)
            masked = jnp.where(lane2 == col, arow_ref[:], np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a4 = masked[:, 0:1].reshape(k1, n2, tb, 1)
            a1v = jax.lax.div(a4, np.int32(n2))
            a2v = jax.lax.rem(a4, np.int32(n2))
            i2r = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, 1), 1)
            q = a1v + (i2r < a2v).astype(jnp.int32)
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            lane4 = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, LANES), 3)
            flip = (((lane4 < qm).astype(jnp.int32) + qd) & 1) == 1

            def rolled(src):
                y = src.reshape(k1, n2, tb, LANES)
                for b in range(n2.bit_length() - 1):
                    rr = pltpu.roll(y, np.int32(1 << b), 1)
                    y = jnp.where((a2v >> b) & 1 == 1, rr, y)
                for b in range(7):
                    rr = pltpu.roll(y, np.int32(1 << b), 3)
                    y = jnp.where((qm >> b) & 1 == 1, rr, y)
                return y

            z_hi = rolled(acc_hi)
            if trunc_acc:
                rot_lo = None
                rot_hi = jnp.where(flip, jnp.zeros_like(z_hi) - z_hi,
                                   z_hi).reshape(R, LANES)
            else:
                z_lo = rolled(acc_lo)
                n_lo, n_hi = neg64(z_lo, z_hi)
                rot_lo = jnp.where(flip, n_lo, z_lo).reshape(R, LANES)
                rot_hi = jnp.where(flip, n_hi, z_hi).reshape(R, LANES)

        if trunc_acc:
            ct1_hi = rot_hi - acc_hi
            digits = _decompose32(jnp.zeros_like(ct1_hi), ct1_hi,
                                  base_log, levels)
        else:
            ct1_lo, ct1_hi = sub64(rot_lo, rot_hi, acc_lo, acc_hi)
            digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)
        dxs = []
        for lev in range(levels):
            if ablate == "dpl":
                dT = st_lo_s[:].reshape(n1, R)
            else:
                dT = jnp.transpose(digits[lev]) + U32(OFF)
            dxs.append(pltpu.bitcast(dT ^ XORC, jnp.int8))

        res_primes = []
        for pi in range(num_primes):
            # ---- stage 1: byte dots + DEFERRED assembly -----------------
            for lev in range(levels):
                if ablate == "s1":
                    diags = [dxs[lev][:n1].astype(jnp.int32)] * 4
                else:
                    diags = [jax.lax.dot_general(
                        L1_ref[pi, d], dxs[lev], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                        for d in range(4)]
                if ablate == "s1a":
                    st_lo_s[:, 0, :] = diags[0][:, :tb].astype(U32)
                    st_hi_s[:, 0, :] = diags[1][:, :tb].astype(U32)
                    continue
                dgA = pltpu.bitcast(diags[0] + (diags[1] << np.int32(8)),
                                    U32) + U32(OFFS)
                dgB = pltpu.bitcast(diags[2] + (diags[3] << np.int32(8)),
                                    U32) + U32(OFFS)
                base = lev * k1 * n2
                if tb % LANES == 0:
                    # single split-minor store (see v9 note: the unrolled
                    # 32-store loops dominated Mosaic compile time)
                    st_lo_s[:, base:base + k1 * n2, :] = \
                        dgA.reshape(n1, k1 * n2, tb)
                    st_hi_s[:, base:base + k1 * n2, :] = \
                        dgB.reshape(n1, k1 * n2, tb)
                else:
                    for kk in range(k1 * n2):
                        st_lo_s[:, base + kk, :] = dgA[:, kk * tb:(kk + 1) * tb]
                        st_hi_s[:, base + kk, :] = dgB[:, kk * tb:(kk + 1) * tb]

            # ---- middle: two-family byte dot (fam1 = 2^16*M) ------------
            r_lo = pltpu.bitcast(st_lo_s[:] ^ XORC, jnp.int8)
            r_hi = pltpu.bitcast(st_hi_s[:] ^ XORC, jnp.int8)
            rhs = jnp.concatenate([r_lo, r_hi], axis=1)     # (128, 8kmid, tb)
            if ablate == "mid":
                diags = [rhs[:, :cmid, :].astype(jnp.int32)] * 7
            else:
                v_pack = m_ref[0, pi][:, :, j * cmid:(j + 1) * cmid]
                if ablate == "mlb":
                    w_all = jnp.broadcast_to(v_pack[:, :, :1],
                                             (n1, 2 * kmid, 8 * cmid))
                else:
                    tiled = pltpu.repeat(v_pack, 8, 2)      # (128,2kmid,8cmid)
                    w_all = (tiled >> shd_ref[:]) << shu_ref[:]
                lhs = pltpu.bitcast(w_all, jnp.int8)        # (128,8kmid,8cmid)
                out = jax.lax.dot_general(
                    lhs, rhs,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)       # (128,8cmid,tb)
                diags = [out[:, d * cmid:(d + 1) * cmid, :]
                         for d in range(7)]
            if ablate == "mida":
                vt_lo_s[:, :tb] = diags[0][:, 0, :].astype(U32)
                vt_hi_s[:, :tb] = diags[1][:, 0, :].astype(U32)
            else:
                cmv = (cm_ref[0, pi][:, j * cmid:(j + 1) * cmid]
                       + U32(mid_const[pi]))[:, :, None]
                Vlo, Vhi, vb = mid_asm[pi](diags, cmv, 2 * (primes[pi] - 1))
                assert (vb >> 32) < (1 << 31)
                if tb % LANES == 0:
                    vt_lo_s[:] = Vlo.reshape(n1, cmid * tb)
                    vt_hi_s[:] = Vhi.reshape(n1, cmid * tb)
                else:
                    for cc in range(cmid):
                        vt_lo_s[:, cc * tb:(cc + 1) * tb] = Vlo[:, cc, :]
                        vt_hi_s[:, cc * tb:(cc + 1) * tb] = Vhi[:, cc, :]

            # ---- inverse stage: 2^32-scaled tables + ONE REDC -----------
            rv = jnp.concatenate(
                [pltpu.bitcast(vt_lo_s[:] ^ XORC, jnp.int8),
                 pltpu.bitcast(vt_hi_s[:] ^ XORC, jnp.int8)], axis=0)
            if ablate == "inv":
                diags = [rv[:n1].astype(jnp.int32)] * 4
            else:
                lhs_i = L1i_ref[pi].reshape(4 * n1, 8 * n1)
                y_all = jax.lax.dot_general(
                    lhs_i, rv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                diags = [y_all[d * n1:(d + 1) * n1] for d in range(4)]
            if ablate == "inva":
                y = pltpu.bitcast(diags[0], U32)
            else:
                ylo, yhi, yb = inv_asm[pi](diags, ci_ref[pi][:, :1],
                                           primes[pi] - 1)
                p_int = primes[pi]
                assert yb < (p_int << 32), hex(yb)
                # REDC32: Y = 2^32 * y_true (mod p) by table pre-scaling
                mm = ylo * _u32(pinvs[pi])
                mp_lo, mp_hi = mulwide(mm, U32(p_int))
                carry = (ylo != U32(0)).astype(U32)
                res = mp_hi + carry
                if yhi is not None:
                    res = res + yhi
                rbnd = p_int + (yb >> 32) + 1
                while rbnd >= p_int:
                    res = jnp.where(res >= U32(p_int), res - U32(p_int), res)
                    rbnd = max(p_int - 1, rbnd - p_int)
                y = res
            res_primes.append(jnp.transpose(y))             # (R, 128)

        if trunc_acc:
            out_lo, out_hi = _garner_acc(
                res_primes, None, None, primes, pinvs, inv_mont, pm_mont,
                prods64, half_digits, p_mod64, num_primes, round_bits,
                ablate)
            acc_hi_s[:] = acc_hi_s[:] + out_hi + (out_lo >> U32(31))
        else:
            new_lo, new_hi = _garner_acc(
                res_primes, acc_lo_s[:], acc_hi_s[:], primes, pinvs,
                inv_mont, pm_mont, prods64, half_digits, p_mod64,
                num_primes, round_bits, ablate)
            acc_lo_s[:] = new_lo
            acc_hi_s[:] = new_hi

    n_steps_pad = -(-n_steps // LANES) * LANES

    def run(acc_lo, acc_hi, a_rows, v32, corr_mid):
        batch_rows = acc_lo.shape[0]
        assert acc_lo.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        assert v32.shape == (n_macro, num_primes, n1, 2 * kmid, ss * cmid), \
            v32.shape
        assert corr_mid.shape == (n_macro, num_primes, n1, ss * cmid)
        n_tiles = batch_rows // R
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec(
                (R, LANES),
                lambda t, s: (t, jax.lax.div(s, np.int32(sub_per_block))),
                memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, 2 * kmid, ss * cmid),
                         lambda t, s: (s,) + (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, ss * cmid),
                         lambda t, s: (s,) + (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 4 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 8 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, n1, LANES),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_macro),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] * 2 +
                           [pltpu.VMEM((n1, kmid, tb), U32)] * 2 +
                           [pltpu.VMEM((n1, cmid * tb), U32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(a_rows, acc_lo, acc_hi, v32, corr_mid,
                    jnp.asarray(L1_np), jnp.asarray(L1i_np),
                    jnp.asarray(corri_np), jnp.asarray(SHD_NP),
                    jnp.asarray(SHU_NP))

    return run


def blind_rotate_pallas_v8(msed_mask, msed_body, lut, v32, corr_mid, plan,
                           base_log: int, levels: int, tb: int = 8,
                           interpret: bool = False,
                           ablate: str | None = None,
                           trunc_acc: bool = True, ss: int = 4):
    """Blind rotation through the v8 macro-step kernel; same semantics as
    ops.mxu.blind_rotate_mxu (trunc_acc=False) / blind_rotate_mxu_trunc
    (trunc_acc=True).  (v32, corr_mid) from mxu.bsk_to_mxu_v8 or
    mxu.middle_v8_from_eval_device with the same `ss`."""
    from .server import monomial_div

    b, k1, n = lut.shape
    ss_c = v32.shape[-1]
    cmid = k1 * (n // 128)
    assert ss_c == ss * cmid, (ss_c, ss, cmid)
    n_in = msed_mask.shape[1]
    assert v32.shape[0] == -(-n_in // ss), (v32.shape, n_in, ss)
    assert b % tb == 0, (b, tb)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    if trunc_acc:
        acc0 = (acc0 + np.uint64(1 << 31)) & np.uint64(0xFFFFFFFF00000000)
    lo0 = to_v4_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                       k1, n, tb)
    hi0 = to_v4_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n, tb)
    run = build_blind_rotate_v8(n, base_log, levels, k1, tb, n_in, interpret,
                                ablate=ablate, num_primes=plan.num_primes,
                                round_bits=plan.round_bits,
                                trunc_acc=trunc_acc, ss=ss)
    n2 = n // 128
    n_pad = -(-n_in // 128) * 128
    mi = msed_mask.astype(jnp.int32)
    a_rows = jnp.tile(mi.reshape(b // tb, 1, tb, n_in), (1, k1 * n2, 1, 1))
    a_rows = a_rows.reshape(b * k1 * n2, n_in)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_in)))
    lo, hi = run(lo0, hi0, a_rows, v32, corr_mid)
    hi = from_v4_layout(hi, b, k1, n, tb)
    if trunc_acc:
        return hi.astype(jnp.uint64) << np.uint64(32)
    lo = from_v4_layout(lo, b, k1, n, tb)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))

# ---------------------------------------------------------------------------
# v9: multi-bit fused kernel — indicator pattern keys, rotation-of-digits
# ---------------------------------------------------------------------------
# One grid sub-step processes a whole GROUP of g secret bits (n/g groups
# instead of n steps).  Per group, the accumulator update is
#     acc <- sum_u contract(E_u_middle, NTT(X^{d_u} * acc))
# with E_u the indicator pattern GGSWs (core/multibit.py, the reference's
# combine_key_bits convention) and d_u the per-pattern switched degrees
# (server.multibit_switched_degrees, precomputed outside the kernel):
#   * the 2^g pattern middles ride ONE mid matmul, concatenated on the
#     contraction axis (2^g x wider K — MXU work, which is abundant);
#   * the per-element cost is 2^g - 1 accumulator rolls + decompositions
#     per group (vs g rolls for g classic steps) feeding 2^g s1 stages;
#   * everything after the mid dot (mid assembly, inverse stage, REDC,
#     Garner, accumulate) runs ONCE per group — 1/g of the classic
#     per-step epilogue.
# The update REPLACES the accumulator (GGSW_eff encrypts the monomial
# X^{sum a_i s_i}); there is no "+ acc" term.  Reference semantics:
# core/multibit.py == lwe_multi_bit_programmable_bootstrapping.rs:319-556;
# exact XLA twin: ops.mxu.blind_rotate_mxu_multibit.


@lru_cache(maxsize=None)
def build_blind_rotate_v9(n: int, base_log: int, levels: int, k1: int,
                          tb: int, n_groups: int, grouping: int,
                          interpret: bool = False,
                          ablate: str | None = None,
                          num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                          round_bits: int = 0, trunc_acc: bool = True,
                          ss: int = 2):
    """Fused multi-bit blind-rotate kernel (see section comment above).

    n_groups = lwe_dimension / grouping.  Caller layout: acc via
    to_v4_layout; a_rows (B*k1*N2, pad128(n_groups*2^g)) i32 per-row pattern
    DEGREES in [0, 2N) (group-major, 2^g consecutive per group — pattern 0's
    column is 0 by construction and is not read); (v32, corr) from
    mxu.middle_v9_from_eval_device with the same ss.
    """
    nsub_a = 1 << grouping
    assert base_log <= 23 and 128 % (ss * nsub_a) == 0
    n1 = LANES
    n2 = n // n1
    nsub = 1 << grouping
    L1_np, L1i_np, invj_sum, plan = _kernel_tables_v8(n, num_primes, base_log)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2
    kmid = levels * k1 * n2          # per-subset contraction rows (words)
    kmid_g = nsub * kmid             # subset-expanded
    cmid = k1 * n2

    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))

    OFF = 1 << (base_log - 1)
    XORC = np.uint32(0x80808080)
    _, OFFS = mxu_mod._v8_consts(plan, base_log)

    b_inv = [8 * n1 * 128 * 128] * 4
    live_m = [len([1 for e in range(4) for f in range(4) if e + f == d])
              for d in range(7)]
    b_mid = [2 * lv * kmid_g * 128 * 128 for lv in live_m]

    mid_asm, inv_asm = [], []
    corri_np = np.zeros((num_primes, n1, LANES), np.uint32)
    mid_const = []
    for pi, p_ in enumerate(primes):
        a_, m_ = ams[pi]
        # The subset-expanded contraction inflates the mid diag bounds by
        # 2^g; the v8 class split (d=4,5 on the pair's hi word at weights
        # 2^32/2^40) then overflows u64.  Pick the cheapest split whose
        # assembled-value bound keeps (vb >> 32) < 2^31: eps-folding a
        # diagonal replaces its 2^(8d) weight by 2^(8d-28)*eps (exact mod
        # p), shrinking the bound at ~2 extra pair-ops each.
        eps_p = a_ * (1 << m_) - 1
        asmm = compm = None
        for hi_ds, eps_ds in (([4, 5], [6]), ([4], [5, 6]), ([], [4, 5, 6])):
            ws_try = [(eps_p << (8 * d - 28)) if d in eps_ds
                      else (1 << (8 * d)) for d in range(7)]
            bound = sum(w * 2 * b for w, b in zip(ws_try, b_mid)) + p_
            hi_ok = all((2 * b_mid[d]) << (8 * (d - hi_ds[0])) < (1 << 32)
                        for d in hi_ds)
            if bound < (1 << 63) and hi_ok:
                wsm, asmm, compm = _weights_and_asm(b_mid, a_, m_,
                                                    hi_ds, eps_ds)
                break
        assert asmm is not None, "no mid assembly split fits u64"
        wsi, asmi, compi = _weights_and_asm(b_inv, a_, m_, [], [])
        mid_asm.append(asmm)
        inv_asm.append(asmi)
        for k in range(n1):
            corri_np[pi, k, :] = (128 * int(invj_sum[pi, k]) - compi) % p_
        mid_const.append((-compm) % p_)

    _blk = np.arange(8 * cmid) // cmid
    SHD_NP = (8 * np.maximum(3 - _blk, 0)).astype(np.uint32)[None, None, :]
    SHU_NP = (8 * np.maximum(_blk - 3, 0)).astype(np.uint32)[None, None, :]

    n_macro = -(-n_groups // ss)
    amounts_per_block = LANES // (ss * nsub)     # macro steps per a-block
    assert (2 * n) & (2 * n - 1) == 0, "2N must be a power of two"

    def kernel(arow_ref, acc_lo_in, acc_hi_in, m_ref, cm_ref, L1_ref,
               L1i_ref, ci_ref, shd_ref, shu_ref,
               out_lo_ref, out_hi_ref,
               acc_lo_s, acc_hi_s, st_lo_s, st_hi_s, vt_lo_s, vt_hi_s):
        t = pl.program_id(0)
        sM = pl.program_id(1)

        @pl.when(sM == 0)
        def _():
            if not trunc_acc:
                acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        rem = n_groups % ss
        for j in range(ss):
            if rem and j >= rem:
                # Sub-steps past the real group count exist only in the
                # zero-padded tail macro group; their keys are all-zero and
                # the group step REPLACES the accumulator, so running them
                # would wipe it.  Skip them there (exact no-op, bit-parity
                # with the XLA twin which scans exactly n_groups).
                @pl.when(sM != np.int32(n_macro - 1))
                def _(j=j):
                    _group_step(j, sM, arow_ref, m_ref, cm_ref, L1_ref,
                                L1i_ref, ci_ref, shd_ref, shu_ref, acc_lo_s,
                                acc_hi_s, st_lo_s, st_hi_s, vt_lo_s, vt_hi_s)
            else:
                _group_step(j, sM, arow_ref, m_ref, cm_ref, L1_ref, L1i_ref,
                            ci_ref, shd_ref, shu_ref, acc_lo_s, acc_hi_s,
                            st_lo_s, st_hi_s, vt_lo_s, vt_hi_s)

        @pl.when(sM == pl.num_programs(1) - 1)
        def _():
            if not trunc_acc:
                out_lo_ref[:] = acc_lo_s[:]
            out_hi_ref[:] = acc_hi_s[:]

    def _group_step(j, sM, arow_ref, m_ref, cm_ref, L1_ref, L1i_ref,
                    ci_ref, shd_ref, shu_ref, acc_lo_s, acc_hi_s,
                    st_lo_s, st_hi_s, vt_lo_s, vt_hi_s):
        acc_lo = None if trunc_acc else acc_lo_s[:]
        acc_hi = acc_hi_s[:]

        # ---- extract the group's 2^g pattern degrees (pattern 0 is 0) --
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        col0 = jax.lax.rem(sM, np.int32(amounts_per_block)) \
            * np.int32(ss * nsub) + np.int32(j * nsub)
        a_t = [None] * nsub                      # pattern degrees
        for u in range(1, nsub):
            masked = jnp.where(lane2 == col0 + np.int32(u), arow_ref[:],
                               np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a_t[u] = masked[:, 0:1].reshape(k1, n2, tb, 1)

        # ---- per subset: rotate acc + decompose + digit byte planes -----
        i2r = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, 1), 1)
        lane4 = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, LANES), 3)

        def rotated(a4):
            """X^{a4} * acc, (R, LANES) pair (trunc: hi only)."""
            a1v = jax.lax.div(a4, np.int32(n2))
            a2v = jax.lax.rem(a4, np.int32(n2))
            q = a1v + (i2r < a2v).astype(jnp.int32)
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            flip = (((lane4 < qm).astype(jnp.int32) + qd) & 1) == 1

            def rolled(src):
                y = src.reshape(k1, n2, tb, LANES)
                for b in range(n2.bit_length() - 1):
                    rr = pltpu.roll(y, np.int32(1 << b), 1)
                    y = jnp.where((a2v >> b) & 1 == 1, rr, y)
                for b in range(7):
                    rr = pltpu.roll(y, np.int32(1 << b), 3)
                    y = jnp.where((qm >> b) & 1 == 1, rr, y)
                return y

            z_hi = rolled(acc_hi)
            if trunc_acc:
                rh = jnp.where(flip, jnp.zeros_like(z_hi) - z_hi, z_hi)
                return None, rh.reshape(R, LANES)
            z_lo = rolled(acc_lo)
            n_lo, n_hi = neg64(z_lo, z_hi)
            return (jnp.where(flip, n_lo, z_lo).reshape(R, LANES),
                    jnp.where(flip, n_hi, z_hi).reshape(R, LANES))

        dxs = []                     # nsub x levels x (4*128, R) int8 planes
        for T in range(nsub):
            if ablate == "rot":
                rot_lo = None if trunc_acc else pltpu.roll(
                    acc_lo, np.int32(1), 1)
                rot_hi = pltpu.roll(acc_hi, np.int32(T % 7 + 1), 1)
            elif T == 0:
                rot_lo, rot_hi = acc_lo, acc_hi
            else:
                rot_lo, rot_hi = rotated(a_t[T])
            if trunc_acc:
                digits = _decompose32(jnp.zeros_like(rot_hi), rot_hi,
                                      base_log, levels)
            else:
                digits = _decompose32(rot_lo, rot_hi, base_log, levels)
            planes = []
            for lev in range(levels):
                dT = jnp.transpose(digits[lev]) + U32(OFF)
                planes.append(pltpu.bitcast(dT ^ XORC, jnp.int8))
            dxs.append(planes)

        res_primes = []
        for pi in range(num_primes):
            # ---- stage 1 per subset: byte dots + DEFERRED assembly ------
            for T in range(nsub):
                for lev in range(levels):
                    if ablate == "s1":
                        diags = [dxs[T][lev][:n1].astype(jnp.int32)] * 4
                    else:
                        diags = [jax.lax.dot_general(
                            L1_ref[pi, d], dxs[T][lev],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                            for d in range(4)]
                    dgA = pltpu.bitcast(diags[0] + (diags[1] << np.int32(8)),
                                        U32) + U32(OFFS)
                    dgB = pltpu.bitcast(diags[2] + (diags[3] << np.int32(8)),
                                        U32) + U32(OFFS)
                    base = (T * levels + lev) * k1 * n2
                    if tb % LANES == 0:
                        # one (128, k1*n2, tb) store: dgA's columns are
                        # already (kk, el)-ordered, so the split-minor
                        # reshape is layout-free; the 32-iteration store
                        # loop was the dominant term in the unrolled
                        # program size (Mosaic compile time, round 4)
                        st_lo_s[:, base:base + k1 * n2, :] = \
                            dgA.reshape(n1, k1 * n2, tb)
                        st_hi_s[:, base:base + k1 * n2, :] = \
                            dgB.reshape(n1, k1 * n2, tb)
                    else:
                        for kk in range(k1 * n2):
                            st_lo_s[:, base + kk, :] = \
                                dgA[:, kk * tb:(kk + 1) * tb]
                            st_hi_s[:, base + kk, :] = \
                                dgB[:, kk * tb:(kk + 1) * tb]

            # ---- middle: two-family byte dot over the expanded K --------
            r_lo = pltpu.bitcast(st_lo_s[:] ^ XORC, jnp.int8)
            r_hi = pltpu.bitcast(st_hi_s[:] ^ XORC, jnp.int8)
            rhs = jnp.concatenate([r_lo, r_hi], axis=1)  # (128, 8kmid_g, tb)
            if ablate == "mid":
                diags = [rhs[:, :cmid, :].astype(jnp.int32)] * 7
            else:
                v_pack = m_ref[0, pi][:, :, j * cmid:(j + 1) * cmid]
                tiled = pltpu.repeat(v_pack, 8, 2)   # (128, 2kmid_g, 8cmid)
                w_all = (tiled >> shd_ref[:]) << shu_ref[:]
                lhs = pltpu.bitcast(w_all, jnp.int8)  # (128,8kmid_g,8cmid)
                out = jax.lax.dot_general(
                    lhs, rhs,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)  # (128, 8cmid, tb)
                diags = [out[:, d * cmid:(d + 1) * cmid, :]
                         for d in range(7)]
            if ablate == "mida":
                vt_lo_s[:, :tb] = diags[0][:, 0, :].astype(U32)
                vt_hi_s[:, :tb] = diags[1][:, 0, :].astype(U32)
            else:
                cmv = (cm_ref[0, pi][:, j * cmid:(j + 1) * cmid]
                       + U32(mid_const[pi]))[:, :, None]
                Vlo, Vhi, vb = mid_asm[pi](diags, cmv, 2 * (primes[pi] - 1))
                assert (vb >> 32) < (1 << 31)
                if tb % LANES == 0:
                    vt_lo_s[:] = Vlo.reshape(n1, cmid * tb)
                    vt_hi_s[:] = Vhi.reshape(n1, cmid * tb)
                else:
                    for cc in range(cmid):
                        vt_lo_s[:, cc * tb:(cc + 1) * tb] = Vlo[:, cc, :]
                        vt_hi_s[:, cc * tb:(cc + 1) * tb] = Vhi[:, cc, :]

            # ---- inverse stage: 2^32-scaled tables + ONE REDC -----------
            rv = jnp.concatenate(
                [pltpu.bitcast(vt_lo_s[:] ^ XORC, jnp.int8),
                 pltpu.bitcast(vt_hi_s[:] ^ XORC, jnp.int8)], axis=0)
            if ablate == "inv":
                diags = [rv[:n1].astype(jnp.int32)] * 4
            else:
                lhs_i = L1i_ref[pi].reshape(4 * n1, 8 * n1)
                y_all = jax.lax.dot_general(
                    lhs_i, rv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                diags = [y_all[d * n1:(d + 1) * n1] for d in range(4)]
            if ablate == "inva":
                y = pltpu.bitcast(diags[0], U32)
            else:
                ylo, yhi, yb = inv_asm[pi](diags, ci_ref[pi][:, :1],
                                           primes[pi] - 1)
                p_int = primes[pi]
                assert yb < (p_int << 32), hex(yb)
                mm = ylo * _u32(pinvs[pi])
                mp_lo, mp_hi = mulwide(mm, U32(p_int))
                carry = (ylo != U32(0)).astype(U32)
                res = mp_hi + carry
                if yhi is not None:
                    res = res + yhi
                rbnd = p_int + (yb >> 32) + 1
                while rbnd >= p_int:
                    res = jnp.where(res >= U32(p_int), res - U32(p_int), res)
                    rbnd = max(p_int - 1, rbnd - p_int)
                y = res
            res_primes.append(jnp.transpose(y))             # (R, 128)

        # ---- Garner once per group; REPLACE the accumulator -------------
        out_lo, out_hi = _garner_acc(
            res_primes, None, None, primes, pinvs, inv_mont, pm_mont,
            prods64, half_digits, p_mod64, num_primes, round_bits, ablate)
        if trunc_acc:
            acc_hi_s[:] = out_hi + (out_lo >> U32(31))
        else:
            acc_lo_s[:] = out_lo
            acc_hi_s[:] = out_hi

    n_amounts = n_groups * nsub
    n_steps_pad = -(-n_amounts // LANES) * LANES

    def run(acc_lo, acc_hi, a_rows, v32, corr_mid):
        batch_rows = acc_lo.shape[0]
        assert acc_lo.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        assert v32.shape == (n_macro, num_primes, n1, 2 * kmid_g,
                             ss * cmid), v32.shape
        assert corr_mid.shape == (n_macro, num_primes, n1, ss * cmid)
        n_tiles = batch_rows // R
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec(
                (R, LANES),
                lambda t, s: (t, jax.lax.div(s, np.int32(amounts_per_block))),
                memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, 2 * kmid_g, ss * cmid),
                         lambda t, s: (s,) + (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((1, num_primes, n1, ss * cmid),
                         lambda t, s: (s,) + (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 4 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 8 * n1),
                         lambda t, s: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, n1, LANES),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s: (z(t),) * 3, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s: (t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_macro),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] * 2 +
                           [pltpu.VMEM((n1, kmid_g, tb), U32)] * 2 +
                           [pltpu.VMEM((n1, cmid * tb), U32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(a_rows, acc_lo, acc_hi, v32, corr_mid,
                    jnp.asarray(L1_np), jnp.asarray(L1i_np),
                    jnp.asarray(corri_np), jnp.asarray(SHD_NP),
                    jnp.asarray(SHU_NP))

    return run


def blind_rotate_pallas_v9(degrees, msed_body, lut, v32, corr_mid, plan,
                           base_log: int, levels: int, grouping: int,
                           tb: int = 8, interpret: bool = False,
                           ablate: str | None = None,
                           trunc_acc: bool = True, ss: int = 2):
    """Multi-bit blind rotation through the v9 fused kernel; same semantics
    as ops.mxu.blind_rotate_mxu_multibit (trunc flag matching).  (v32,
    corr_mid) from mxu.middle_v9_from_eval_device with the same ss/g.
    degrees: (B, n_g, 2^g) u64 pattern degrees in [0, 2N) from
    server.multibit_switched_degrees."""
    from .server import monomial_div

    b, k1, n = lut.shape
    nsub = 1 << grouping
    cmid = k1 * (n // 128)
    b_d, n_groups, nsub_d = degrees.shape
    assert (b_d, nsub_d) == (b, nsub)
    assert v32.shape[0] == -(-n_groups // ss), (v32.shape, n_groups, ss)
    assert v32.shape[-2] == 2 * nsub * levels * cmid
    assert b % tb == 0, (b, tb)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    if trunc_acc:
        acc0 = (acc0 + np.uint64(1 << 31)) & np.uint64(0xFFFFFFFF00000000)
    lo0 = to_v4_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                       k1, n, tb)
    hi0 = to_v4_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n, tb)
    run = build_blind_rotate_v9(n, base_log, levels, k1, tb, n_groups,
                                grouping, interpret, ablate=ablate,
                                num_primes=plan.num_primes,
                                round_bits=plan.round_bits,
                                trunc_acc=trunc_acc, ss=ss)
    n2 = n // 128
    n_amounts = n_groups * nsub
    n_pad = -(-n_amounts // 128) * 128
    di = degrees.reshape(b, n_amounts).astype(jnp.int32)
    a_rows = jnp.tile(di.reshape(b // tb, 1, tb, n_amounts),
                      (1, k1 * n2, 1, 1))
    a_rows = a_rows.reshape(b * k1 * n2, n_amounts)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_amounts)))
    lo, hi = run(lo0, hi0, a_rows, v32, corr_mid)
    hi = from_v4_layout(hi, b, k1, n, tb)
    if trunc_acc:
        return hi.astype(jnp.uint64) << np.uint64(32)
    lo = from_v4_layout(lo, b, k1, n, tb)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))

# ---------------------------------------------------------------------------
# v9g: grid-scheduled fused multi-bit kernel (v9 semantics, small program)
# ---------------------------------------------------------------------------
# Same math as v9 (indicator pattern keys), but scheduled for compilability
# and VMEM instead of maximal fusion:
#   * the macro-group sub-step j and the 2^g pattern index T run on the
#     GRID (tiles, n_macro, ss, 2^g) instead of being unrolled — the Mosaic
#     program contains ONE front (rotate + decompose + s1) and one
#     predicated epilogue, ~1/(ss*2^g) of the unrolled v9 program.  On this
#     1-core host the unrolled v9 body never finished compiling (>2 h,
#     perf_harness/_r4_queue3.log); a v7-sized body compiles in ~15 min.
#   * the subset-expanded middle contraction is SPLIT per pattern: the
#     middle tensor is SUBSET-MAJOR (middle_v9_from_eval_device
#     subset_major=True), each grid step runs its own v7-sized mid dot
#     right after its front and accumulates the raw i32 diagonals in
#     scratch (exact — the dot is linear in its contraction), and the
#     epilogue at T = 2^g - 1 assembles/inverts/Garners ONCE per group.
#     The one-shot epilogue variant held 2^g x bigger mid temporaries and
#     overflowed VMEM at production shape (302 MB > 128 MB).
#   * the per-pattern key row block rides the BlockSpec index map (rows
#     are second-minor — sliceable; lanes are not), so only 2*kmid key
#     rows are VMEM-resident per step instead of the whole group.
# trunc_acc-only (the production configuration).  Bit-exact vs
# ops.mxu.blind_rotate_mxu_multibit(trunc=True).
# Reference semantics: lwe_multi_bit_programmable_bootstrapping.rs:329-451.


def _sel_by_scalar(idx, parts):
    """parts[idx] for a traced scalar idx via a where-chain (Mosaic's
    select_n lowering only supports 2 cases)."""
    out = parts[0]
    for i in range(1, len(parts)):
        out = jnp.where(idx == i, parts[i], out)
    return out


@lru_cache(maxsize=None)
def build_blind_rotate_v9g(n: int, base_log: int, levels: int, k1: int,
                           tb: int, n_groups: int, grouping: int,
                           interpret: bool = False,
                           ablate: str | None = None,
                           num_primes: int = mxu_mod.N_PRIMES_DEFAULT,
                           round_bits: int = 0, ss: int = 2,
                           t_lanes: bool = False):
    """Grid-scheduled fused multi-bit blind-rotate (see section comment).

    Caller layout: acc via to_v4_layout; a_rows group-major pattern degrees
    (as v9); (v32, corr) from mxu.middle_v9_from_eval_device with the same
    ss and subset_major=True.
    """
    nsub = 1 << grouping
    assert base_log <= 23 and 128 % (ss * nsub) == 0
    assert interpret or tb % LANES == 0, \
        "v9g uses the collapsed (layout-free) stores"
    n1 = LANES
    n2 = n // n1
    L1_np, L1i_np, invj_sum, plan = _kernel_tables_v8(n, num_primes, base_log)
    primes = [int(p) for p in plan.primes]
    pinvs = [int(ntt_mod.make_plan(n, num_primes, primes=plan.primes)
               .plans[i].p_inv_neg32) for i in range(num_primes)]
    gplan = plan.garner
    gc = ntt_mod._garner_consts(gplan.primes)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    R = tb * k1 * n2
    kmid = levels * k1 * n2              # per-pattern contraction rows
    kmid_g = nsub * kmid                 # subset-expanded (bounds only)
    cmid = k1 * n2

    ams = []
    for p_ in primes:
        e1 = (1 << 28) + 1 - p_
        m_ = (e1 & -e1).bit_length() - 1
        ams.append((e1 >> m_, m_))

    OFF = 1 << (base_log - 1)
    XORC = np.uint32(0x80808080)
    _, OFFS = mxu_mod._v8_consts(plan, base_log)

    b_inv = [8 * n1 * 128 * 128] * 4
    live_m = [len([1 for e in range(4) for f in range(4) if e + f == d])
              for d in range(7)]
    # accumulated-diagonal bounds: the per-pattern partial dots sum to the
    # same totals as the one-shot subset-expanded dot (v9's b_mid)
    b_mid = [2 * lv * kmid_g * 128 * 128 for lv in live_m]

    # per-pattern partial-assembly bounds: each grid step assembles ONE
    # pattern's diagonals (bounds b_mid/2^g) and the pairs are summed with
    # carries across the 2^g steps; the per-call +bd offsets then total
    # exactly the one-shot compensation (b_mid is divisible by 2^g), so
    # mid_const is unchanged and the accumulated pair is bit-identical to
    # the one-shot assembly of the summed diagonals.
    b_mid_sub = [b // nsub for b in b_mid]
    assert all(b % nsub == 0 for b in b_mid)

    mid_asm, inv_asm = [], []
    corri_np = np.zeros((num_primes, n1, LANES), np.uint32)
    mid_const = []
    for pi, p_ in enumerate(primes):
        a_, m_ = ams[pi]
        eps_p = a_ * (1 << m_) - 1
        asmm = None
        for hi_ds, eps_ds in (([4, 5], [6]), ([4], [5, 6]), ([], [4, 5, 6])):
            ws_try = [(eps_p << (8 * d - 28)) if d in eps_ds
                      else (1 << (8 * d)) for d in range(7)]
            bound = sum(w * 2 * b for w, b in zip(ws_try, b_mid)) + p_
            hi_ok = all((2 * b_mid[d]) << (8 * (d - hi_ds[0])) < (1 << 32)
                        for d in hi_ds)
            if bound < (1 << 63) and hi_ok:
                wsm, asmm, compm_sub = _weights_and_asm(b_mid_sub, a_, m_,
                                                        hi_ds, eps_ds)
                break
        assert asmm is not None, "no mid assembly split fits u64"
        # accumulated-pair bound over 2^g partial assemblies + corr once
        vb_acc = (sum(w * 2 * b for w, b in zip(wsm, b_mid_sub)) * nsub
                  + 2 * (p_ - 1))
        assert (vb_acc >> 32) < (1 << 31), hex(vb_acc)
        wsi, asmi, compi = _weights_and_asm(b_inv, a_, m_, [], [])
        mid_asm.append(asmm)
        inv_asm.append(asmi)
        for k in range(n1):
            corri_np[pi, k, :] = (128 * int(invj_sum[pi, k]) - compi) % p_
        mid_const.append((-(compm_sub * nsub)) % p_)

    _blk = np.arange(8 * cmid) // cmid
    SHD_NP = (8 * np.maximum(3 - _blk, 0)).astype(np.uint32)[None, None, :]
    SHU_NP = (8 * np.maximum(_blk - 3, 0)).astype(np.uint32)[None, None, :]

    n_macro = -(-n_groups // ss)
    amounts_per_block = LANES // (ss * nsub)
    rem_tail = n_groups % ss
    assert (2 * n) & (2 * n - 1) == 0, "2N must be a power of two"

    def kernel(arow_ref, acc_hi_in, m_ref, cm_ref, L1_ref, L1i_ref,
               ci_ref, shd_ref, shu_ref, out_hi_ref,
               acc_hi_s, st_lo_s, st_hi_s, vt_lo_s, vt_hi_s):
        sM = pl.program_id(1)
        jj = pl.program_id(2)
        T = pl.program_id(3)

        @pl.when((sM == 0) & (jj == 0) & (T == 0))
        def _():
            acc_hi_s[:] = acc_hi_in[:]

        def front_and_partial():
            """Rotation + decompose + s1 dots of this step's pattern, then
            the pattern's v7-sized mid-dot partial, accumulated in acm_s."""
            acc_hi = acc_hi_s[:]
            # -- this step's pattern degree (one a_rows column) -----------
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            col = jax.lax.rem(sM, np.int32(amounts_per_block)) \
                * np.int32(ss * nsub) + jj * np.int32(nsub) + T
            masked = jnp.where(lane2 == col, arow_ref[:], np.int32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                masked = masked + pltpu.roll(masked, np.int32(sh), 1)
            a4 = masked[:, 0:1].reshape(k1, n2, tb, 1)

            # -- X^{d} * acc (trunc: hi word only; d=0 is the identity) ---
            i2r = jax.lax.broadcasted_iota(jnp.int32, (k1, n2, tb, 1), 1)
            lane4 = jax.lax.broadcasted_iota(jnp.int32,
                                             (k1, n2, tb, LANES), 3)
            a1v = jax.lax.div(a4, np.int32(n2))
            a2v = jax.lax.rem(a4, np.int32(n2))
            q = a1v + (i2r < a2v).astype(jnp.int32)
            qm = jax.lax.rem(q, np.int32(LANES))
            qd = jax.lax.div(q, np.int32(LANES))
            flip = (((lane4 < qm).astype(jnp.int32) + qd) & 1) == 1
            if ablate == "rot":
                rot_hi = pltpu.roll(acc_hi, np.int32(1), 1)
            else:
                y = acc_hi.reshape(k1, n2, tb, LANES)
                for b in range(n2.bit_length() - 1):
                    rr = pltpu.roll(y, np.int32(1 << b), 1)
                    y = jnp.where((a2v >> b) & 1 == 1, rr, y)
                for b in range(7):
                    rr = pltpu.roll(y, np.int32(1 << b), 3)
                    y = jnp.where((qm >> b) & 1 == 1, rr, y)
                rot_hi = jnp.where(flip, jnp.zeros_like(y) - y,
                                   y).reshape(R, LANES)

            digits = _decompose32(jnp.zeros_like(rot_hi), rot_hi,
                                  base_log, levels)
            for lev in range(levels):
                dT = jnp.transpose(digits[lev]) + U32(OFF)
                plane = pltpu.bitcast(dT ^ XORC, jnp.int8)
                base = lev * cmid
                for pi in range(num_primes):
                    if ablate == "s1":
                        diags = [plane[:n1].astype(jnp.int32)] * 4
                    else:
                        diags = [jax.lax.dot_general(
                            L1_ref[pi, d], plane,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                            for d in range(4)]
                    dgA = pltpu.bitcast(diags[0] + (diags[1] << np.int32(8)),
                                        U32) + U32(OFFS)
                    dgB = pltpu.bitcast(diags[2] + (diags[3] << np.int32(8)),
                                        U32) + U32(OFFS)
                    st_lo_s[pi, :, base:base + cmid, :] = \
                        dgA.reshape(n1, cmid, tb)
                    st_hi_s[pi, :, base:base + cmid, :] = \
                        dgB.reshape(n1, cmid, tb)

            # -- this pattern's middle partial: v7-sized dot, assembled
            # and accumulated as an exact u64 PAIR (same weights for every
            # pattern; the corr constant rides pattern 0 only, so the
            # accumulated pair equals the one-shot asm of the summed
            # diagonals bit-exactly, at 2 MB of scratch per word instead
            # of a 50 MB raw-i32 accumulator -- the VMEM wall)
            for pi in range(num_primes):
                r_lo = pltpu.bitcast(st_lo_s[pi] ^ XORC, jnp.int8)
                r_hi = pltpu.bitcast(st_hi_s[pi] ^ XORC, jnp.int8)
                rhs = jnp.concatenate([r_lo, r_hi], axis=1)  # (n1,8kmid,tb)
                if ablate == "mid":
                    outd = jnp.zeros((n1, 8 * cmid, tb), jnp.int32)
                else:
                    if t_lanes:
                        # the group's 2*kmid key rows arrived via the
                        # BlockSpec (row-block jj, constant across the 2^g
                        # inner steps -> one DMA per group); T picks the
                        # pattern lane slice
                        mj = [m_ref[0, pi][:, :, u * cmid:(u + 1) * cmid]
                              for u in range(nsub)]
                        v_pack = _sel_by_scalar(T, mj)
                    else:
                        # this pattern's 2*kmid key rows arrived via the
                        # BlockSpec (row-block T); jj picks the lane slice
                        mj = [m_ref[0, pi][:, :, jc * cmid:(jc + 1) * cmid]
                              for jc in range(ss)]
                        v_pack = (mj[0] if ss == 1
                                  else _sel_by_scalar(jj, mj))
                    tiled = pltpu.repeat(v_pack, 8, 2)  # (n1,2kmid,8cmid)
                    w_all = (tiled >> shd_ref[:]) << shu_ref[:]
                    lhs = pltpu.bitcast(w_all, jnp.int8)
                    outd = jax.lax.dot_general(
                        lhs, rhs,
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)  # (n1,8cmid,tb)
                diags = [outd[:, d * cmid:(d + 1) * cmid, :]
                         for d in range(7)]
                cj = [cm_ref[0, pi][:, jc * cmid:(jc + 1) * cmid]
                      for jc in range(ss)]
                cmv = ((cj[0] if ss == 1 else _sel_by_scalar(jj, cj))
                       + U32(mid_const[pi]))[:, :, None]
                cmv = jnp.where(T == 0, cmv, jnp.zeros_like(cmv))
                Vlo, Vhi, vb = mid_asm[pi](diags, cmv,
                                           2 * (primes[pi] - 1))
                assert (vb >> 32) < (1 << 31)
                lo_u = Vlo.reshape(n1, cmid * tb)
                hi_u = Vhi.reshape(n1, cmid * tb)

                @pl.when(T == 0)
                def _(pi=pi, lo_u=lo_u, hi_u=hi_u):
                    vt_lo_s[pi] = lo_u
                    vt_hi_s[pi] = hi_u

                @pl.when(T != 0)
                def _(pi=pi, lo_u=lo_u, hi_u=hi_u):
                    lo_old = vt_lo_s[pi]
                    lo_new = lo_old + lo_u
                    carry = (lo_new < lo_old).astype(U32)
                    vt_lo_s[pi] = lo_new
                    vt_hi_s[pi] = vt_hi_s[pi] + hi_u + carry

        def epilogue():
            """Inverse + Garner over the accumulated assembled pairs;
            REPLACES the accumulator (v9 semantics)."""
            res_primes = []
            for pi in range(num_primes):
                # ---- inverse stage: 2^32-scaled tables + ONE REDC -------
                rv = jnp.concatenate(
                    [pltpu.bitcast(vt_lo_s[pi] ^ XORC, jnp.int8),
                     pltpu.bitcast(vt_hi_s[pi] ^ XORC, jnp.int8)], axis=0)
                if ablate == "inv":
                    diags = [rv[:n1].astype(jnp.int32)] * 4
                else:
                    lhs_i = L1i_ref[pi].reshape(4 * n1, 8 * n1)
                    y_all = jax.lax.dot_general(
                        lhs_i, rv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    diags = [y_all[d * n1:(d + 1) * n1] for d in range(4)]
                if ablate == "inva":
                    y = pltpu.bitcast(diags[0], U32)
                else:
                    ylo, yhi, yb = inv_asm[pi](diags, ci_ref[pi][:, :1],
                                               primes[pi] - 1)
                    p_int = primes[pi]
                    assert yb < (p_int << 32), hex(yb)
                    mm = ylo * _u32(pinvs[pi])
                    mp_lo, mp_hi = mulwide(mm, U32(p_int))
                    carry = (ylo != U32(0)).astype(U32)
                    res = mp_hi + carry
                    if yhi is not None:
                        res = res + yhi
                    rbnd = p_int + (yb >> 32) + 1
                    while rbnd >= p_int:
                        res = jnp.where(res >= U32(p_int), res - U32(p_int),
                                        res)
                        rbnd = max(p_int - 1, rbnd - p_int)
                    y = res
                res_primes.append(jnp.transpose(y))         # (R, 128)

            # ---- Garner once per group; REPLACE the accumulator ---------
            out_lo, out_hi = _garner_acc(
                res_primes, None, None, primes, pinvs, inv_mont, pm_mont,
                prods64, half_digits, p_mod64, num_primes, round_bits,
                ablate)
            acc_hi_s[:] = out_hi + (out_lo >> U32(31))

        def step():
            front_and_partial()

            @pl.when(T == nsub - 1)
            def _():
                epilogue()

        if rem_tail:
            # tail-padded sub-groups exist only at sM == n_macro - 1 (zero
            # keys; running them would REPLACE acc with zero) — skip them
            @pl.when((sM != np.int32(n_macro - 1))
                     | (jj < np.int32(rem_tail)))
            def _():
                step()
        else:
            step()

        @pl.when((sM == pl.num_programs(1) - 1)
                 & (jj == pl.num_programs(2) - 1)
                 & (T == pl.num_programs(3) - 1))
        def _():
            out_hi_ref[:] = acc_hi_s[:]

    n_amounts = n_groups * nsub
    n_steps_pad = -(-n_amounts // LANES) * LANES

    def run(acc_hi, a_rows, v32, corr_mid):
        batch_rows = acc_hi.shape[0]
        assert acc_hi.shape == (batch_rows, LANES)
        assert batch_rows % R == 0
        assert a_rows.shape == (batch_rows, n_steps_pad), a_rows.shape
        if t_lanes:
            assert v32.shape == (n_macro, num_primes, n1, ss * 2 * kmid,
                                 nsub * cmid), v32.shape
        else:
            assert v32.shape == (n_macro, num_primes, n1, 2 * kmid_g,
                                 ss * cmid), v32.shape
        assert corr_mid.shape == (n_macro, num_primes, n1, ss * cmid)
        n_tiles = batch_rows // R
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec(
                (R, LANES),
                lambda t, s, j, T: (t, jax.lax.div(
                    s, np.int32(amounts_per_block))),
                memory_space=vmem),
            pl.BlockSpec((R, LANES), lambda t, s, j, T: (t, z(t)),
                         memory_space=vmem),
            # key row block: t_lanes slices rows by the sub-group jj
            # (pattern on lanes; one DMA per group), else by the pattern T
            (pl.BlockSpec((1, num_primes, n1, 2 * kmid, nsub * cmid),
                          lambda t, s, j, T: (s, z(t), z(t), j, z(t)),
                          memory_space=vmem) if t_lanes else
             pl.BlockSpec((1, num_primes, n1, 2 * kmid, ss * cmid),
                          lambda t, s, j, T: (s, z(t), z(t), T, z(t)),
                          memory_space=vmem)),
            pl.BlockSpec((1, num_primes, n1, ss * cmid),
                         lambda t, s, j, T: (s, z(t), z(t), z(t)),
                         memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 4 * n1),
                         lambda t, s, j, T: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, 4, n1, 8 * n1),
                         lambda t, s, j, T: (z(t),) * 4, memory_space=vmem),
            pl.BlockSpec((num_primes, n1, LANES),
                         lambda t, s, j, T: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s, j, T: (z(t),) * 3, memory_space=vmem),
            pl.BlockSpec((1, 1, 8 * cmid),
                         lambda t, s, j, T: (z(t),) * 3, memory_space=vmem),
        ]
        out_specs = [pl.BlockSpec((R, LANES), lambda t, s, j, T: (t, z(t)),
                                  memory_space=vmem)]
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_macro, ss, nsub),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch_rows, LANES), U32)],
            scratch_shapes=[pltpu.VMEM((R, LANES), U32)] +
                           [pltpu.VMEM((num_primes, n1, kmid, tb), U32)] * 2 +
                           [pltpu.VMEM((num_primes, n1, cmid * tb),
                                       U32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024,
                dimension_semantics=("arbitrary",) * 4,
            ),
        )
        return call(a_rows, acc_hi, v32, corr_mid,
                    jnp.asarray(L1_np), jnp.asarray(L1i_np),
                    jnp.asarray(corri_np), jnp.asarray(SHD_NP),
                    jnp.asarray(SHU_NP))[0]

    return run


def blind_rotate_pallas_v9g(degrees, msed_body, lut, v32, corr_mid, plan,
                            base_log: int, levels: int, grouping: int,
                            tb: int = 128, interpret: bool = False,
                            ablate: str | None = None, ss: int = 4,
                            t_lanes: bool = False):
    """Multi-bit blind rotation through the grid-scheduled v9g kernel;
    trunc-mode semantics of ops.mxu.blind_rotate_mxu_multibit(trunc=True).
    (v32, corr_mid) from mxu.middle_v9_from_eval_device with the same ss/g
    and subset_major=True.  degrees: (B, n_g, 2^g) u64 pattern degrees in
    [0, 2N) from server.multibit_switched_degrees."""
    from .server import monomial_div

    b, k1, n = lut.shape
    nsub = 1 << grouping
    b_d, n_groups, nsub_d = degrees.shape
    assert (b_d, nsub_d) == (b, nsub)
    kmid_ = levels * k1 * (n // 128)
    assert v32.shape[0] == -(-n_groups // ss), (v32.shape, n_groups, ss)
    if t_lanes:
        assert v32.shape[-2:] == (ss * 2 * kmid_,
                                  nsub * k1 * (n // 128)), v32.shape
    else:
        assert v32.shape[-2] == 2 * nsub * kmid_, v32.shape
    assert b % tb == 0, (b, tb)
    acc0 = monomial_div(lut, msed_body[:, None, None])
    acc0 = (acc0 + np.uint64(1 << 31)) & np.uint64(0xFFFFFFFF00000000)
    hi0 = to_v4_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n, tb)
    run = build_blind_rotate_v9g(n, base_log, levels, k1, tb, n_groups,
                                 grouping, interpret, ablate=ablate,
                                 num_primes=plan.num_primes,
                                 round_bits=plan.round_bits, ss=ss,
                                 t_lanes=t_lanes)
    n2 = n // 128
    n_amounts = n_groups * nsub
    n_pad = -(-n_amounts // 128) * 128
    di = degrees.reshape(b, n_amounts).astype(jnp.int32)
    a_rows = jnp.tile(di.reshape(b // tb, 1, tb, n_amounts),
                      (1, k1 * n2, 1, 1))
    a_rows = a_rows.reshape(b * k1 * n2, n_amounts)
    a_rows = jnp.pad(a_rows, ((0, 0), (0, n_pad - n_amounts)))
    hi = run(hi0, a_rows, v32, corr_mid)
    hi = from_v4_layout(hi, b, k1, n, tb)
    return hi.astype(jnp.uint64) << np.uint64(32)
