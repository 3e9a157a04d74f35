"""Pallas TPU kernel for the blind-rotation CMux step (external product core).

Motivation (measured on v5e): the XLA-level NTT runs each inverse stage as a
separate HBM pass (~0.4 ms per INTT at B=256) because fusion breaks across
the stage loop; the monomial rotation lowers to a slow gather.  This kernel
keeps the whole CMux step in VMEM:

  acc' = acc + ExternalProduct(GGSW_i, acc * X^{a_i} - acc)

with the negacyclic CRT-NTT running entirely on u32 lanes:
  - 64-bit torus values travel as (lo, hi) u32 pairs (Mosaic has no u64);
  - 32x32->64 products via 16-bit limb splits; Montgomery REDC32 mod each
    31-bit prime;
  - NTT stages with butterfly distance >= 128 pair sublane rows (free
    reshapes); distances < 128 pair lanes via pltpu.roll + masks;
  - the monomial rotation uses a doubled (negated) buffer and one dynamic
    slice per batch element — no gathers.

Layouts: polynomials are (R, 128) tiles with R = N/128; twiddle tables are
precomputed per (prime, stage) on the host in exactly the layout the
butterflies consume.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt as ntt_mod

LANES = 128

U32 = jnp.uint32
_u32 = np.uint32


# ---------------------------------------------------------------------------
# u32-pair (64-bit) helpers — all values little-endian (lo, hi)
# ---------------------------------------------------------------------------


def mulwide(a, b):
    """32x32 -> 64 product as (lo, hi) u32 via 16-bit limbs."""
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    carry_mid = (mid < p01).astype(U32)
    lo = p00 + (mid << U32(16))
    carry_lo = (lo < p00).astype(U32)
    hi = p11 + (mid >> U32(16)) + (carry_mid << U32(16)) + carry_lo
    return lo, hi


def add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return lo, ahi + bhi + carry


def sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(U32)
    return lo, ahi - bhi - borrow


def neg64(lo, hi):
    zlo = jnp.zeros_like(lo)
    return sub64(zlo, zlo, lo, hi)


def shr64_to32(lo, hi, s: int):
    """(x >> s) truncated to u32, for static 0 <= s < 64."""
    if s == 0:
        return lo
    if s < 32:
        return (lo >> U32(s)) | (hi << U32(32 - s))
    if s == 32:
        return hi
    return hi >> U32(s - 32)


def mont_mul32(a, b_mont, p: np.uint32, p_inv_neg: np.uint32):
    """a * b mod p (b in Montgomery form), all u32; result < p."""
    tlo, thi = mulwide(a, b_mont)
    m = tlo * _u32(p_inv_neg)  # low 32 bits
    mplo, mphi = mulwide(m, U32(p))
    carry = (tlo != U32(0)).astype(U32)  # tlo + mplo is 0 or 2^32
    u = thi + mphi + carry
    return jnp.where(u >= U32(p), u - U32(p), u)


def add_mod32(a, b, p: np.uint32):
    s = a + b
    return jnp.where(s >= U32(p), s - U32(p), s)


def sub_mod32(a, b, p: np.uint32):
    d = a + U32(p) - b
    return jnp.where(d >= U32(p), d - U32(p), d)


# ---------------------------------------------------------------------------
# Host-side stage tables
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class StageTables:
    """Per-prime butterfly twiddles laid out per stage.

    Forward (CT, natural -> bitrev) stage with m blocks of size 2t:
      fwd[stage] shape (P, N): twiddle for every position (same value across
      each block's 2t positions — position j uses psi_br[m + j // (2t)]).
    Inverse (GS, bitrev -> natural) stage with h blocks of size 2t:
      inv[stage] similarly from psi_inv_br[h + j // (2t)].
    """

    n: int
    num_primes: int
    fwd: tuple   # tuple[np.ndarray (P, N) u32] per stage, t = N/2 .. 1
    inv: tuple   # per stage, t = 1 .. N/2
    n_inv_mont: np.ndarray  # (P, 1) u32
    ps: np.ndarray          # (P, 1) u32
    pinvs: np.ndarray       # (P, 1) u32


@lru_cache(maxsize=None)
def make_stage_tables(n: int, num_primes: int = 4) -> StageTables:
    plan = ntt_mod.make_plan(n, num_primes)
    num_stages = n.bit_length() - 1
    fwd, inv = [], []
    idx = np.arange(n)
    # forward: m = 1, 2, ..., N/2 ; t = N/2 ... 1 ; block = j // t_pair
    m = 1
    t = n
    while m < n:
        t //= 2
        per_prime = []
        for pi in range(num_primes):
            tab = plan.plans[pi].psi_br_mont.astype(np.uint32)
            per_prime.append(tab[m + idx // (2 * t)])
        fwd.append(np.stack(per_prime))
        m *= 2
    # inverse: t = 1, 2, ...; h = N/2 ...
    t = 1
    m = n
    while m > 1:
        h = m // 2
        per_prime = []
        for pi in range(num_primes):
            tab = plan.plans[pi].psi_inv_br_mont.astype(np.uint32)
            per_prime.append(tab[h + idx // (2 * t)])
        inv.append(np.stack(per_prime))
        t *= 2
        m = h
    return StageTables(
        n=n, num_primes=num_primes,
        fwd=tuple(np.ascontiguousarray(f) for f in fwd),
        inv=tuple(np.ascontiguousarray(f) for f in inv),
        n_inv_mont=np.stack([p.n_inv_mont.astype(np.uint32) for p in plan.plans]),
        ps=plan.ps.astype(np.uint32),
        pinvs=plan.pinvs.astype(np.uint32),
    )


# ---------------------------------------------------------------------------
# In-kernel NTT over a (..., N) u32 array for one prime
# ---------------------------------------------------------------------------


def _butterfly_ct(x, s_vec, t: int, p, pinv):
    """One CT stage on (..., N): pairs (j, j+t) within blocks of 2t."""
    n = x.shape[-1]
    if t >= LANES or x.ndim == 1:
        shape = x.shape[:-1] + (n // (2 * t), 2, t)
        xv = x.reshape(shape)
        u = xv[..., 0, :]
        vin = xv[..., 1, :]
        sv = s_vec.reshape(n // (2 * t), 2, t)[..., 0, :]
        v = mont_mul32(vin, sv, p, pinv)
        out = jnp.concatenate(
            [(add_mod32(u, v, p))[..., None, :], (sub_mod32(u, v, p))[..., None, :]],
            axis=-2,
        )
        return out.reshape(x.shape)
    # lane-level stage: partner via roll along the last axis
    rolled_m = pltpu.roll(x, np.int32(n - t), axis=x.ndim - 1)  # x[j+t] at j
    rolled_p = pltpu.roll(x, np.int32(t), axis=x.ndim - 1)   # x[j-t] at j
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    is_lo = ((j // np.int32(t)) % np.int32(2)) == np.int32(0)
    # twiddle for the pair lives at the lo position; s_vec is constant across
    # each 2t block so s_vec[j] works for both positions.
    v_for_lo = mont_mul32(rolled_m, s_vec, p, pinv)   # v * s at lo positions
    v_for_hi = mont_mul32(x, s_vec, p, pinv)          # (this position is v)
    lo_out = add_mod32(x, v_for_lo, p)
    hi_out = sub_mod32(rolled_p, v_for_hi, p)
    return jnp.where(is_lo, lo_out, hi_out)


def _butterfly_gs(x, s_vec, t: int, p, pinv):
    """One GS stage on (..., N): out_lo = u+v, out_hi = (u-v)*s."""
    n = x.shape[-1]
    if t >= LANES or x.ndim == 1:
        shape = x.shape[:-1] + (n // (2 * t), 2, t)
        xv = x.reshape(shape)
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        sv = s_vec.reshape(n // (2 * t), 2, t)[..., 0, :]
        lo = add_mod32(u, v, p)
        hi = mont_mul32(sub_mod32(u, v, p), sv, p, pinv)
        out = jnp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2)
        return out.reshape(x.shape)
    rolled_m = pltpu.roll(x, np.int32(n - t), axis=x.ndim - 1)
    rolled_p = pltpu.roll(x, np.int32(t), axis=x.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    is_lo = ((j // np.int32(t)) % np.int32(2)) == np.int32(0)
    lo_out = add_mod32(x, rolled_m, p)
    hi_out = mont_mul32(sub_mod32(rolled_p, x, p), s_vec, p, pinv)
    return jnp.where(is_lo, lo_out, hi_out)


def ntt_fwd_inkernel(x, tables: StageTables, prime_idx: int, fwd_refs):
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    n = tables.n
    t = n
    for s_i in range(len(tables.fwd)):
        t //= 2
        s_vec = fwd_refs[s_i][prime_idx]
        x = _butterfly_ct(x, s_vec, t, p, pinv)
    return x


def ntt_inv_inkernel(x, tables: StageTables, prime_idx: int, inv_refs):
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    t = 1
    for s_i in range(len(tables.inv)):
        s_vec = inv_refs[s_i][prime_idx]
        x = _butterfly_gs(x, s_vec, t, p, pinv)
        t *= 2
    ninv = _u32(tables.n_inv_mont[prime_idx, 0])
    return mont_mul32(x, jnp.full(x.shape, ninv, dtype=U32), p, _u32(tables.pinvs[prime_idx, 0]))


# ---------------------------------------------------------------------------
# The fused CMux step kernel
# ---------------------------------------------------------------------------


def _decompose32(lo, hi, base_log: int, levels: int):
    """Branch-free signed decomposition on u32 pairs (rep <= 31).

    Returns digits (level l first) as signed-wrapped u32, |digit| <= B/2.
    """
    rep = base_log * levels
    assert rep <= 31, "pallas path supports base_log*levels <= 31"
    nonrep = 64 - rep
    res = shr64_to32(lo, hi, nonrep - 1)
    rounding = res & U32(1)
    res = (res + U32(1)) >> U32(1)
    res = res & U32((1 << rep) - 1)
    nb = (((res - U32(1)) | (rounding << U32(rep - 1))) & res) >> U32(rep - 1)
    state = res - (nb << U32(rep))
    mask = U32((1 << base_log) - 1)
    digits = []
    for _ in range(levels):
        r = state & mask
        state = (state.astype(jnp.int32) >> np.int32(base_log)).astype(U32)
        carry = (((r - U32(1)) | state) & r) >> U32(base_log - 1)
        state = state + carry
        digits.append(r - (carry << U32(base_log)))
    return digits


def _digit_residue(d, p: np.uint32):
    """Signed-wrapped u32 digit -> residue mod p (|d| small)."""
    neg = d >> U32(31)
    negval = jnp.zeros_like(d) - d
    return jnp.where(neg.astype(bool), U32(p) - negval, d)


@lru_cache(maxsize=None)
def build_cmux_step(n: int, num_primes: int, base_log: int, levels: int,
                    k1: int, tb: int, interpret: bool = False):
    """Returns a jittable fn(acc_lo, acc_hi, adeg, bsk_slice, *tables) that
    applies one CMux accumulation step for a whole batch.

    acc_lo/hi: (B, k1, N) u32; adeg: (B,) int32 in [0, 2N);
    bsk_slice: (l, k1, k1, P, N) u32.
    """
    tables = make_stage_tables(n, num_primes)
    plan = ntt_mod.make_plan(n, num_primes)
    gc = ntt_mod._garner_consts(plan.primes)
    num_stages = n.bit_length() - 1
    primes = [int(p) for p in plan.primes]

    # static garner constants (u32 views)
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    def kernel(*refs):
        adeg_ref = refs[0]
        acc_lo_ref, acc_hi_ref, bsk_ref = refs[1], refs[2], refs[3]
        fwd_refs = refs[4 : 4 + num_stages]
        inv_refs = refs[4 + num_stages : 4 + 2 * num_stages]
        out_lo_ref, out_hi_ref = refs[4 + 2 * num_stages], refs[5 + 2 * num_stages]
        rot_lo_ref, rot_hi_ref = refs[6 + 2 * num_stages], refs[7 + 2 * num_stages]

        acc_lo = acc_lo_ref[:]
        acc_hi = acc_hi_ref[:]

        # ---- per-element monomial rotation via doubled-negated buffer ----
        # y = [x, -x, x, -x]; (x * X^a)[j] = y[(j - a) mod 2N] = y4[start + j]
        # (x * X^a)[j] = y[(j - a) mod 2N] with y = [x, -x]: a dynamic circular
        # roll right by a (tpu.dynamic_rotate), then keep the first N lanes.
        neg_lo, neg_hi = neg64(acc_lo, acc_hi)
        y_lo = jnp.concatenate([acc_lo, neg_lo], axis=-1)  # (TB, k1, 2N)
        y_hi = jnp.concatenate([acc_hi, neg_hi], axis=-1)
        for el in range(tb):
            a = adeg_ref[el]
            rot_lo_ref[el] = pltpu.roll(y_lo[el], a, axis=1)[:, :n]
            rot_hi_ref[el] = pltpu.roll(y_hi[el], a, axis=1)[:, :n]

        # ct1 = rotated - acc
        ct1_lo, ct1_hi = sub64(rot_lo_ref[:], rot_hi_ref[:], acc_lo, acc_hi)

        # ---- decompose -> per-level digits ----
        digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)  # l x (TB,k1,N)

        # ---- per prime: fwd NTT, pointwise-accumulate, INTT ----
        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(int(plan.plans[pi].p_inv_neg32))
            acc_cols = None
            fwd_digits = []
            for lev in range(levels):
                d = _digit_residue(digits[lev], p)
                fwd_digits.append(ntt_fwd_inkernel(d, tables, pi, fwd_refs))
            for c in range(k1):
                col = None
                for lev in range(levels):
                    for r in range(k1):
                        key = bsk_ref[lev, r, c, pi]  # (N,)
                        prod = mont_mul32(fwd_digits[lev][:, r, :], key, p, pinv)
                        col = prod if col is None else add_mod32(col, prod, p)
                col = ntt_inv_inkernel(col, tables, pi, inv_refs)  # (TB, N)
                acc_cols = col[:, None, :] if acc_cols is None else jnp.concatenate(
                    [acc_cols, col[:, None, :]], axis=1)
            res_primes.append(acc_cols)  # (TB, k1, N) residues < p

        # ---- Garner CRT -> u64 pair, with sign correction ----
        a_digits = [res_primes[0]]
        for j in range(1, num_primes):
            pj = _u32(primes[j])
            pinv_j = _u32(int(plan.plans[j].p_inv_neg32))
            v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
            for i in range(1, j):
                term = mont_mul32(a_digits[i], jnp.full(v.shape, _u32(pm_mont[(i - 1, j)]), U32), pj, pinv_j)
                vv = v + term
                v = jnp.where(vv >= pj, vv - pj, vv)
            r = res_primes[j]
            d = jnp.where(r >= v, r - v, r + pj - v)
            a_digits.append(
                mont_mul32(d, jnp.full(d.shape, _u32(inv_mont[j - 1]), U32), pj, pinv_j))
        out_lo = a_digits[0]
        out_hi = jnp.zeros_like(out_lo)
        for i in range(1, num_primes):
            c = prods64[i]
            c_lo, c_hi = _u32(c & 0xFFFFFFFF), _u32((c >> 32) & 0xFFFFFFFF)
            t_lo, t_hi = mulwide(a_digits[i], jnp.full(out_lo.shape, c_lo, U32))
            t_hi = t_hi + a_digits[i] * c_hi
            out_lo, out_hi = add64(out_lo, out_hi, t_lo, t_hi)
        # sign: lexicographic compare of mixed-radix digits vs floor(P/2)
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

        # acc' = acc + external product
        new_lo, new_hi = add64(acc_lo, acc_hi, out_lo, out_hi)
        out_lo_ref[:] = new_lo
        out_hi_ref[:] = new_hi

    def make(batch: int):
        # NOTE: this Mosaic build fails to legalize kernels with an explicit
        # grid, so the kernel is gridless (one batch tile per launch) and the
        # caller loops over tiles.
        assert batch == tb
        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), vmem(), vmem(), vmem()]
        in_specs += [vmem()] * (2 * num_stages)
        return pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=[vmem(), vmem()],
            out_shape=[jax.ShapeDtypeStruct((tb, k1, n), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((tb, k1, n), U32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    # keep tables as numpy: jnp constants created inside one trace must not
    # leak into another via the lru_cache (pallas_call converts per call)
    fwd_tabs = list(tables.fwd)
    inv_tabs = list(tables.inv)

    def step(acc_lo, acc_hi, adeg, bsk_slice):
        batch = acc_lo.shape[0]
        call = make(tb)
        outs_lo, outs_hi = [], []
        for t0 in range(0, batch, tb):
            o_lo, o_hi = call(adeg[t0 : t0 + tb], acc_lo[t0 : t0 + tb],
                              acc_hi[t0 : t0 + tb], bsk_slice,
                              *fwd_tabs, *inv_tabs)
            outs_lo.append(o_lo)
            outs_hi.append(o_hi)
        return jnp.concatenate(outs_lo), jnp.concatenate(outs_hi)

    return step


# ---------------------------------------------------------------------------
# Whole-blind-rotate kernel: grid = (batch tiles, mask elements), accumulator
# persists in VMEM scratch across grid steps, BSK slices stream via BlockSpec
# (Pallas double-buffers the per-step DMA).  Removes all inter-launch
# overhead of the scan-of-kernels formulation.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def build_blind_rotate(n: int, num_primes: int, base_log: int, levels: int,
                       k1: int, tb: int, n_steps: int, interpret: bool = False):
    """Returns fn(acc_lo, acc_hi, adegs, bsk) -> (lo, hi).

    acc_lo/hi: (B, k1, N) u32 (B a multiple of tb); adegs: (n_steps, B) i32
    in [0, 2N); bsk: (n_steps, l, k1, k1, P, N) u32 Montgomery NTT domain.
    """
    tables = make_stage_tables(n, num_primes)
    plan = ntt_mod.make_plan(n, num_primes)
    gc = ntt_mod._garner_consts(plan.primes)
    num_stages = n.bit_length() - 1
    primes = [int(p) for p in plan.primes]
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    def kernel(*refs):
        adeg_ref = refs[0]                    # (1, tb) SMEM
        acc_lo_in, acc_hi_in = refs[1], refs[2]   # (tb, k1, N)
        bsk_ref = refs[3]                     # (1, l, k1, k1, P, N)
        fwd_refs = refs[4 : 4 + num_stages]
        inv_refs = refs[4 + num_stages : 4 + 2 * num_stages]
        out_lo_ref, out_hi_ref = refs[4 + 2 * num_stages], refs[5 + 2 * num_stages]
        acc_lo_s, acc_hi_s = refs[6 + 2 * num_stages], refs[7 + 2 * num_stages]
        rot_lo_ref, rot_hi_ref = refs[8 + 2 * num_stages], refs[9 + 2 * num_stages]

        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        acc_lo = acc_lo_s[:]
        acc_hi = acc_hi_s[:]

        # per-element monomial rotation via doubled-negated buffer.  (A
        # bit-gated barrel of static full-tile rolls was tried and measured
        # SLOWER — lane-crossing rolls dominate either way on this Mosaic.)
        neg_lo, neg_hi = neg64(acc_lo, acc_hi)
        y_lo = jnp.concatenate([acc_lo, neg_lo], axis=-1)
        y_hi = jnp.concatenate([acc_hi, neg_hi], axis=-1)
        for el in range(tb):
            a = adeg_ref[0, 0, t * tb + el]
            rot_lo_ref[el] = pltpu.roll(y_lo[el], a, axis=1)[:, :n]
            rot_hi_ref[el] = pltpu.roll(y_hi[el], a, axis=1)[:, :n]

        ct1_lo, ct1_hi = sub64(rot_lo_ref[:], rot_hi_ref[:], acc_lo, acc_hi)
        digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(int(plan.plans[pi].p_inv_neg32))
            fwd_digits = []
            for lev in range(levels):
                d = _digit_residue(digits[lev], p)
                fwd_digits.append(ntt_fwd_inkernel(d, tables, pi, fwd_refs))
            acc_cols = None
            for c in range(k1):
                col = None
                for lev in range(levels):
                    for r in range(k1):
                        key = bsk_ref[0, lev, r, c, pi]
                        prod = mont_mul32(fwd_digits[lev][:, r, :], key, p, pinv)
                        col = prod if col is None else add_mod32(col, prod, p)
                col = ntt_inv_inkernel(col, tables, pi, inv_refs)
                acc_cols = col[:, None, :] if acc_cols is None else jnp.concatenate(
                    [acc_cols, col[:, None, :]], axis=1)
            res_primes.append(acc_cols)

        a_digits = [res_primes[0]]
        for j in range(1, num_primes):
            pj = _u32(primes[j])
            pinv_j = _u32(int(plan.plans[j].p_inv_neg32))
            v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
            for i in range(1, j):
                term = mont_mul32(a_digits[i], jnp.full(v.shape, _u32(pm_mont[(i - 1, j)]), U32), pj, pinv_j)
                vv = v + term
                v = jnp.where(vv >= pj, vv - pj, vv)
            r = res_primes[j]
            d = jnp.where(r >= v, r - v, r + pj - v)
            a_digits.append(
                mont_mul32(d, jnp.full(d.shape, _u32(inv_mont[j - 1]), U32), pj, pinv_j))
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

        new_lo, new_hi = add64(acc_lo, acc_hi, out_lo, out_hi)
        acc_lo_s[:] = new_lo
        acc_hi_s[:] = new_hi

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_lo_ref[:] = new_lo
            out_hi_ref[:] = new_hi

    fwd_tabs = list(tables.fwd)
    inv_tabs = list(tables.inv)

    def run(acc_lo, acc_hi, adegs, bsk):
        batch = acc_lo.shape[0]
        assert batch % tb == 0, (batch, tb)
        n_tiles = batch // tb
        l = bsk.shape[1]
        vmem = pltpu.VMEM
        grid = (n_tiles, n_steps)
        # NOTE: index maps derive every component from the grid ids (0*t)
        # so they trace as i32 under jax_enable_x64 — Mosaic rejects i64
        # index maps ("failed to legalize func.return").
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, batch), lambda t, s: (s, z(t), z(t)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, k1, n), lambda t, s: (t, z(t), z(t)), memory_space=vmem),
            pl.BlockSpec((tb, k1, n), lambda t, s: (t, z(t), z(t)), memory_space=vmem),
            pl.BlockSpec((1, l, k1, k1, num_primes, n),
                         lambda t, s: (s, z(t), z(t), z(t), z(t), z(t)),
                         memory_space=vmem),
        ]
        in_specs += [pl.BlockSpec((num_primes, n), lambda t, s: (z(t), z(t)),
                                  memory_space=vmem)] * (2 * num_stages)
        out_specs = [pl.BlockSpec((tb, k1, n), lambda t, s: (t, z(t), z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch, k1, n), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((tb, k1, n), U32)] * 4,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(adegs.reshape(n_steps, 1, batch), acc_lo, acc_hi, bsk,
                    *fwd_tabs, *inv_tabs)

    return run


# ---------------------------------------------------------------------------
# v2 kernel: chunk layout (C = N/128, S = tb*k1, 128) — every elementwise op
# runs on full (S, 128) vregs (the flat (tb, k1, N) layout left 4-8x of the
# VPU idle: reshapes along the 2048-lane axis demote tiles to (2,128)/(1,128)
# shapes and flattened-axis rolls cross 16 vregs).  Butterfly stages with
# pair distance >= 128 pair CHUNKS (leading dim, free); distances < 128 stay
# inside one 128-lane vreg (intra-vreg rolls).
# ---------------------------------------------------------------------------


def mont_mul32_lazy(a, b_mont, p: np.uint32, p_inv_neg: np.uint32):
    """REDC without the final conditional subtract: a < 4p, b_mont < p ->
    result < 2p.  Valid only for p < 2^30 (4p < 2^32)."""
    tlo, thi = mulwide(a, b_mont)
    m = tlo * _u32(p_inv_neg)
    mplo, mphi = mulwide(m, U32(p))
    carry = (tlo != U32(0)).astype(U32)
    return thi + mphi + carry


def _lazy_sub2p(x, p: np.uint32):
    twop = U32(2 * int(p))
    return jnp.where(x >= twop, x - twop, x)


def _bf_ct_lazy(x, s_vec, t: int, p, pinv):
    """Harvey lazy forward CT stage: inputs and outputs < 4p (one
    conditional subtract per butterfly instead of three)."""
    C = x.shape[0]
    twop = U32(2 * int(p))
    if t >= LANES:
        dc = t // LANES
        mc = C // (2 * dc)
        xv = x.reshape(mc, 2, dc, *x.shape[1:])
        u = _lazy_sub2p(xv[:, 0], p)
        sv = s_vec.reshape(mc, 2, dc, 1, LANES)[:, 0]
        v = mont_mul32_lazy(xv[:, 1], sv, p, pinv)
        out = jnp.concatenate([(u + v)[:, None], (u + twop - v)[:, None]], axis=1)
        return out.reshape(x.shape)
    xs = _lazy_sub2p(x, p)
    rolled_m = pltpu.roll(x, np.int32(LANES - t), axis=2)   # partner v (lazy ok)
    rolled_ps = pltpu.roll(xs, np.int32(t), axis=2)         # partner u (reduced)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    is_lo = ((lane // np.int32(t)) % np.int32(2)) == np.int32(0)
    v_lo = mont_mul32_lazy(rolled_m, s_vec, p, pinv)
    v_hi = mont_mul32_lazy(x, s_vec, p, pinv)
    lo_out = xs + v_lo
    hi_out = rolled_ps + twop - v_hi
    return jnp.where(is_lo, lo_out, hi_out)


def _bf_gs_lazy(x, s_vec, t: int, p, pinv):
    """Lazy inverse GS stage: inputs and outputs < 2p."""
    C = x.shape[0]
    twop = U32(2 * int(p))
    if t >= LANES:
        dc = t // LANES
        mc = C // (2 * dc)
        xv = x.reshape(mc, 2, dc, *x.shape[1:])
        u = xv[:, 0]
        v = xv[:, 1]
        lo = _lazy_sub2p(u + v, p)
        hi = mont_mul32_lazy(u + twop - v,
                             s_vec.reshape(mc, 2, dc, 1, LANES)[:, 0], p, pinv)
        out = jnp.concatenate([lo[:, None], hi[:, None]], axis=1)
        return out.reshape(x.shape)
    rolled_m = pltpu.roll(x, np.int32(LANES - t), axis=2)
    rolled_p = pltpu.roll(x, np.int32(t), axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    is_lo = ((lane // np.int32(t)) % np.int32(2)) == np.int32(0)
    lo_out = _lazy_sub2p(x + rolled_m, p)
    hi_out = mont_mul32_lazy(rolled_p + twop - x, s_vec, p, pinv)
    return jnp.where(is_lo, lo_out, hi_out)


def _ntt_fwd_lazy(x, tables, prime_idx, fwd_refs):
    """Forward NTT with lazy butterflies: input < p, output < 4p."""
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    n = tables.n
    t = n
    for s_i in range(len(tables.fwd)):
        t //= 2
        s_vec = fwd_refs[s_i][prime_idx][:, None, :]
        x = _bf_ct_lazy(x, s_vec, t, p, pinv)
    return x


def _ntt_inv_lazy(x, tables, prime_idx, inv_refs):
    """Inverse NTT with lazy butterflies: input < 2p, output < p (the final
    n_inv Montgomery multiply uses the strict reduction)."""
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    t = 1
    for s_i in range(len(tables.inv)):
        s_vec = inv_refs[s_i][prime_idx][:, None, :]
        x = _bf_gs_lazy(x, s_vec, t, p, pinv)
        t *= 2
    ninv = _u32(tables.n_inv_mont[prime_idx, 0])
    return mont_mul32(x, jnp.full(x.shape, ninv, dtype=U32), p, pinv)


def _bf_ct_v2(x, s_vec, t: int, p, pinv):
    """Forward CT stage on (C, S, 128); s_vec: (C, 1, 128)."""
    C = x.shape[0]
    n = C * LANES
    if t >= LANES:
        dc = t // LANES
        mc = C // (2 * dc)
        xv = x.reshape(mc, 2, dc, *x.shape[1:])
        u = xv[:, 0]
        vin = xv[:, 1]
        sv = s_vec.reshape(mc, 2, dc, 1, LANES)[:, 0]
        v = mont_mul32(vin, sv, p, pinv)
        out = jnp.concatenate([(add_mod32(u, v, p))[:, None],
                               (sub_mod32(u, v, p))[:, None]], axis=1)
        return out.reshape(x.shape)
    rolled_m = pltpu.roll(x, np.int32(LANES - t), axis=2)
    rolled_p = pltpu.roll(x, np.int32(t), axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    is_lo = ((lane // np.int32(t)) % np.int32(2)) == np.int32(0)
    v_for_lo = mont_mul32(rolled_m, s_vec, p, pinv)
    v_for_hi = mont_mul32(x, s_vec, p, pinv)
    lo_out = add_mod32(x, v_for_lo, p)
    hi_out = sub_mod32(rolled_p, v_for_hi, p)
    return jnp.where(is_lo, lo_out, hi_out)


def _bf_gs_v2(x, s_vec, t: int, p, pinv):
    """Inverse GS stage on (C, S, 128)."""
    C = x.shape[0]
    if t >= LANES:
        dc = t // LANES
        mc = C // (2 * dc)
        xv = x.reshape(mc, 2, dc, *x.shape[1:])
        u = xv[:, 0]
        v = xv[:, 1]
        sv = s_vec.reshape(mc, 2, dc, 1, LANES)[:, 0]
        lo = add_mod32(u, v, p)
        hi = mont_mul32(sub_mod32(u, v, p), sv, p, pinv)
        out = jnp.concatenate([lo[:, None], hi[:, None]], axis=1)
        return out.reshape(x.shape)
    rolled_m = pltpu.roll(x, np.int32(LANES - t), axis=2)
    rolled_p = pltpu.roll(x, np.int32(t), axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    is_lo = ((lane // np.int32(t)) % np.int32(2)) == np.int32(0)
    lo_out = add_mod32(x, rolled_m, p)
    hi_out = mont_mul32(sub_mod32(rolled_p, x, p), s_vec, p, pinv)
    return jnp.where(is_lo, lo_out, hi_out)


def _ntt_fwd_v2(x, tables, prime_idx, fwd_refs):
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    n = tables.n
    t = n
    for s_i in range(len(tables.fwd)):
        t //= 2
        s_vec = fwd_refs[s_i][prime_idx][:, None, :]  # (C, 1, 128)
        x = _bf_ct_v2(x, s_vec, t, p, pinv)
    return x


def _ntt_inv_v2(x, tables, prime_idx, inv_refs):
    p = _u32(tables.ps[prime_idx, 0])
    pinv = _u32(tables.pinvs[prime_idx, 0])
    t = 1
    for s_i in range(len(tables.inv)):
        s_vec = inv_refs[s_i][prime_idx][:, None, :]
        x = _bf_gs_v2(x, s_vec, t, p, pinv)
        t *= 2
    ninv = _u32(tables.n_inv_mont[prime_idx, 0])
    return mont_mul32(x, jnp.full(x.shape, ninv, dtype=U32), p,
                      _u32(tables.pinvs[prime_idx, 0]))


@lru_cache(maxsize=None)
def build_blind_rotate_v2(n: int, num_primes: int, base_log: int, levels: int,
                          k1: int, tb: int, n_steps: int,
                          interpret: bool = False):
    """Chunk-layout whole-blind-rotate kernel.

    Caller-side layout: acc_lo/hi (C, B*k1, 128) u32 with C = n // 128 and
    poly coeff p of element s at [p // 128, s, p % 128]; adegs (n_steps, B)
    i32; bsk (n_steps, l, k1, k1, P, C, 128) u32.
    Returns (lo, hi) in the same chunk layout.
    """
    C = n // LANES
    S = tb * k1
    tables = make_stage_tables(n, num_primes)
    plan = ntt_mod.make_plan(n, num_primes)
    gc = ntt_mod._garner_consts(plan.primes)
    num_stages = n.bit_length() - 1
    primes = [int(p) for p in plan.primes]
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    prods64 = [int(v) for v in gc["prods64"]]
    half_digits = [int(v) for v in gc["half_digits"]]
    p_mod64 = int(gc["P_mod64"])

    def kernel(*refs):
        adeg_ref = refs[0]
        acc_lo_in, acc_hi_in = refs[1], refs[2]
        bsk_ref = refs[3]
        fwd_refs = refs[4 : 4 + num_stages]
        inv_refs = refs[4 + num_stages : 4 + 2 * num_stages]
        out_lo_ref, out_hi_ref = refs[4 + 2 * num_stages], refs[5 + 2 * num_stages]
        acc_lo_s, acc_hi_s = refs[6 + 2 * num_stages], refs[7 + 2 * num_stages]
        rot_lo_ref, rot_hi_ref = refs[8 + 2 * num_stages], refs[9 + 2 * num_stages]

        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]

        acc_lo = acc_lo_s[:]   # (C, S, 128)
        acc_hi = acc_hi_s[:]

        # ---- monomial rotation, chunk layout ----
        # doubled-negated buffer along chunks: (2C, S, 128)
        neg_lo, neg_hi = neg64(acc_lo, acc_hi)
        y_lo = jnp.concatenate([acc_lo, neg_lo], axis=0)
        y_hi = jnp.concatenate([acc_hi, neg_hi], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * C, k1, LANES), 2)
        for el in range(tb):
            a = adeg_ref[0, 0, t * tb + el]
            q_amt = jax.lax.div(a, np.int32(LANES))   # chunk shift
            rl = jax.lax.rem(a, np.int32(LANES))       # lane shift
            cols = slice(el * k1, (el + 1) * k1)
            zl = pltpu.roll(y_lo[:, cols, :], rl, axis=2)
            zh = pltpu.roll(y_hi[:, cols, :], rl, axis=2)
            # chunk-level roll by q (+1 extra for lanes that wrapped)
            zl_q = pltpu.roll(zl, q_amt, axis=0)
            zh_q = pltpu.roll(zh, q_amt, axis=0)
            zl_q1 = pltpu.roll(zl, q_amt + np.int32(1), axis=0)
            zh_q1 = pltpu.roll(zh, q_amt + np.int32(1), axis=0)
            sel = lane < rl
            rot_lo_ref[:, cols, :] = jnp.where(sel, zl_q1, zl_q)[:C]
            rot_hi_ref[:, cols, :] = jnp.where(sel, zh_q1, zh_q)[:C]

        ct1_lo, ct1_hi = sub64(rot_lo_ref[:], rot_hi_ref[:], acc_lo, acc_hi)
        digits = _decompose32(ct1_lo, ct1_hi, base_log, levels)  # l x (C,S,128)

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(int(plan.plans[pi].p_inv_neg32))
            fwd_digits = []
            for lev in range(levels):
                d = _digit_residue(digits[lev], p)
                fwd_digits.append(_ntt_fwd_lazy(d, tables, pi, fwd_refs))
            acc_cols = None
            for c in range(k1):
                col = None
                for lev in range(levels):
                    for r in range(k1):
                        key = bsk_ref[0, lev, r, c, pi][:, None, :]  # (C,1,128)
                        # rows of element el live at column el*k1 + r; fwd
                        # values are lazy (< 4p) — the strict REDC still
                        # lands < p
                        fr = fwd_digits[lev].reshape(C, tb, k1, LANES)[:, :, r, :]
                        prod = mont_mul32(fr, key, p, pinv)  # (C, tb, 128)
                        col = prod if col is None else add_mod32(col, prod, p)
                col = _ntt_inv_lazy(col, tables, pi, inv_refs)  # (C, tb, 128)
                acc_cols = col[:, :, None, :] if acc_cols is None else jnp.concatenate(
                    [acc_cols, col[:, :, None, :]], axis=2)
            res_primes.append(acc_cols.reshape(C, S, LANES))

        a_digits = [res_primes[0]]
        for j in range(1, num_primes):
            pj = _u32(primes[j])
            pinv_j = _u32(int(plan.plans[j].p_inv_neg32))
            v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
            for i in range(1, j):
                term = mont_mul32(a_digits[i], jnp.full(v.shape, _u32(pm_mont[(i - 1, j)]), U32), pj, pinv_j)
                vv = v + term
                v = jnp.where(vv >= pj, vv - pj, vv)
            r = res_primes[j]
            d = jnp.where(r >= v, r - v, r + pj - v)
            a_digits.append(
                mont_mul32(d, jnp.full(d.shape, _u32(inv_mont[j - 1]), U32), pj, pinv_j))
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

        new_lo, new_hi = add64(acc_lo, acc_hi, out_lo, out_hi)
        acc_lo_s[:] = new_lo
        acc_hi_s[:] = new_hi

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_lo_ref[:] = new_lo
            out_hi_ref[:] = new_hi

    # stage tables reshaped into the chunk layout (P, C, 128)
    fwd_tabs = [f.reshape(num_primes, C, LANES) for f in tables.fwd]
    inv_tabs = [f.reshape(num_primes, C, LANES) for f in tables.inv]

    def run(acc_lo, acc_hi, adegs, bsk):
        batch_s = acc_lo.shape[1]
        assert acc_lo.shape == (C, batch_s, LANES), acc_lo.shape
        assert batch_s % S == 0
        n_tiles = batch_s // S
        batch = batch_s // k1
        l = bsk.shape[1]
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, batch), lambda t, s: (s, z(t), z(t)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)), memory_space=vmem),
            pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, l, k1, k1, num_primes, C, LANES),
                         lambda t, s: (s, z(t), z(t), z(t), z(t), z(t), z(t)),
                         memory_space=vmem),
        ]
        in_specs += [pl.BlockSpec((num_primes, C, LANES),
                                  lambda t, s: (z(t), z(t), z(t)),
                                  memory_space=vmem)] * (2 * num_stages)
        out_specs = [pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)),
                                  memory_space=vmem)] * 2
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((C, batch_s, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((C, S, LANES), U32)] * 4,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(adegs.reshape(n_steps, 1, batch), acc_lo, acc_hi, bsk,
                    *fwd_tabs, *inv_tabs)

    return run


def to_chunk_layout(x, k1: int, n: int):
    """(B, k1, N) -> (C, B*k1, 128) for build_blind_rotate_v2."""
    b = x.shape[0]
    c = n // LANES
    return jnp.transpose(x.reshape(b * k1, c, LANES), (1, 0, 2))


def from_chunk_layout(x, b: int, k1: int, n: int):
    c = n // LANES
    return jnp.transpose(x, (1, 0, 2)).reshape(b, k1, n)

# NOTE: a rotation-free multibit-style variant (effective GGSW assembled
# in the NTT domain) was prototyped and measured SLOWER than v2 and not
# bit-identical to the classic path (decomposition is nonlinear); v2 stays
# the production kernel.


# ---------------------------------------------------------------------------
# v2q: the u128-torus (PBS128 / noise squashing) variant of v2.
#
# Torus values travel as FOUR u32 words (little-endian w0..w3); the CRT-NTT
# runs over 6 primes (~186 bits, exceeding the 2^166 external-product bound
# of the v1_4 squashing family), so the kernel is exact — same guarantee the
# XLA path (ops/server128.py) gives, fused into one VMEM-resident program.
# Mirrors the reference's fft128 PBS role
# (tfhe/src/core_crypto/fft_impl/fft128/, programmable_bootstrap_classic_128.cu)
# with an exact integer engine instead of split-double f64.
# ---------------------------------------------------------------------------


def addq(a, b):
    """Multi-word add (little-endian lists of u32 arrays), wrapping."""
    out = []
    carry = None
    for i in range(len(a)):
        s = a[i] + b[i]
        c = (s < a[i]).astype(U32)
        if carry is not None:
            s2 = s + carry
            c = c + (s2 < carry).astype(U32)
            s = s2
        out.append(s)
        carry = c
    return out


def subq(a, b):
    """Multi-word subtract, wrapping two's complement."""
    out = []
    borrow = None
    for i in range(len(a)):
        d = a[i] - b[i]
        bo = (a[i] < b[i]).astype(U32)
        if borrow is not None:
            d2 = d - borrow
            bo = bo + (d < borrow).astype(U32)
            d = d2
        out.append(d)
        borrow = bo
    return out


def negq(a):
    z = [jnp.zeros_like(a[0])] * len(a)
    return subq(z, a)


def _decompose128q(w, base_log: int, levels: int):
    """Branch-free signed decomposition on u32 quads (decomposer.rs semantics
    on the u128 torus; parity oracle: ops/server128.signed_decompose128).

    Supports 32 < rep <= 96 (the v1_4 squashing family is base 24, l=3 ->
    rep 72).  Digits are returned level-l-first as sign-wrapped u32 with
    |digit| <= B/2 (they fit: base_log <= 31)."""
    rep = base_log * levels
    assert 32 < rep <= 96 and base_log <= 31
    z = jnp.zeros_like(w[0])
    s = 128 - rep - 1
    wsh, bs = divmod(s, 32)
    r = []
    for i in range(4):
        lo = w[i + wsh] if i + wsh < 4 else z
        hi = w[i + wsh + 1] if i + wsh + 1 < 4 else z
        r.append(((lo >> U32(bs)) | (hi << U32(32 - bs))) if bs else lo)
    rounding = r[0] & U32(1)
    one = [jnp.ones_like(r[0]), z, z, z]
    r = addq(r, one)
    r = [(r[i] >> U32(1)) | (r[i + 1] << U32(31)) for i in range(3)] + \
        [r[3] >> U32(1)]
    tw, tbits = divmod(rep, 32)
    q = []
    for i in range(4):
        if i < tw:
            q.append(r[i])
        elif i == tw and tbits:
            q.append(r[i] & U32((1 << tbits) - 1))
        else:
            q.append(z)
    # need-balance bit at position rep-1 of ((q-1) | rounding<<(rep-1)) & q
    m = subq(q, one)
    nbw, nbb = divmod(rep - 1, 32)
    t = (m[nbw] | (rounding << U32(nbb))) & q[nbw]
    nb = (t >> U32(nbb)) & U32(1)
    # state = q - nb*2^rep over W words of two's complement (bit rep lands in
    # the top state word for every rep in (32, 96])
    W = (rep + 1 + 31) // 32
    st = [q[i] for i in range(W)]
    st[W - 1] = st[W - 1] - (nb << U32(rep - 32 * (W - 1)))
    mask = U32((1 << base_log) - 1)
    digits = []
    for _ in range(levels):
        d = st[0] & mask
        new = [(st[i] >> U32(base_log)) | (st[i + 1] << U32(32 - base_log))
               for i in range(W - 1)]
        new.append((st[W - 1].astype(jnp.int32) >> np.int32(base_log))
                   .astype(U32))
        st = new
        carry = (((d - U32(1)) | st[0]) & d) >> U32(base_log - 1)
        c = carry
        for i in range(W):
            s2 = st[i] + c
            c = (s2 < c).astype(U32)
            st[i] = s2
        digits.append(d - (carry << U32(base_log)))
    return digits


def _words128(x: int):
    return [(x >> (32 * i)) & 0xFFFFFFFF for i in range(4)]


def _mulq_const128(a, cw):
    """u32 array * 128-bit python-int constant words -> quad mod 2^128."""
    z = jnp.zeros_like(a)
    t = [z, z, z, z]
    for j in range(4):
        c = int(cw[j])
        if c == 0:
            continue
        lo, hi = mulwide(a, jnp.full(a.shape, _u32(c), U32))
        part = [z, z, z, z]
        part[j] = lo
        if j + 1 < 4:
            part[j + 1] = hi
        t = addq(t, part)
    return t


def build_blind_rotate_v2q(n: int, num_primes: int, base_log: int, levels: int,
                           k1: int, tb: int, n_steps: int,
                           interpret: bool = False):
    """Chunk-layout whole-blind-rotate kernel over the u128 torus.

    Caller-side layout: acc words w0..w3 each (C, B*k1, 128) u32 (C = n//128,
    little-endian 32-bit words of the u128 coefficient); adegs (n_steps, B)
    i32; bsk (n_steps, l, k1, k1, P, C, 128) u32 Montgomery eval-domain.
    Returns the four accumulator words in the same chunk layout.
    """
    C = n // LANES
    S = tb * k1
    tables = make_stage_tables(n, num_primes)
    plan = ntt_mod.make_plan(n, num_primes)
    gc = ntt_mod._garner_consts(plan.primes)
    num_stages = n.bit_length() - 1
    primes = [int(p) for p in plan.primes]
    inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, num_primes)]
    pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
    half_digits = [int(v) for v in gc["half_digits"]]
    prods128q = []
    acc_p = 1
    for p in primes:
        prods128q.append(_words128(acc_p & ((1 << 128) - 1)))
        acc_p *= p
    p_mod128q = _words128(acc_p & ((1 << 128) - 1))

    def kernel(*refs):
        adeg_ref = refs[0]
        acc_in = refs[1:5]
        bsk_ref = refs[5]
        fwd_refs = refs[6: 6 + num_stages]
        inv_refs = refs[6 + num_stages: 6 + 2 * num_stages]
        out_refs = refs[6 + 2 * num_stages: 10 + 2 * num_stages]
        acc_s = refs[10 + 2 * num_stages: 14 + 2 * num_stages]
        rot_refs = refs[14 + 2 * num_stages: 18 + 2 * num_stages]

        t = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            for w in range(4):
                acc_s[w][:] = acc_in[w][:]

        acc = [acc_s[w][:] for w in range(4)]   # 4 x (C, S, 128)

        # ---- monomial rotation, chunk layout (quad words) ----
        neg = negq(acc)
        y = [jnp.concatenate([acc[w], neg[w]], axis=0) for w in range(4)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * C, k1, LANES), 2)
        for el in range(tb):
            a = adeg_ref[0, 0, t * tb + el]
            q_amt = jax.lax.div(a, np.int32(LANES))
            rl = jax.lax.rem(a, np.int32(LANES))
            cols = slice(el * k1, (el + 1) * k1)
            sel = lane < rl
            for w in range(4):
                zw = pltpu.roll(y[w][:, cols, :], rl, axis=2)
                zq = pltpu.roll(zw, q_amt, axis=0)
                zq1 = pltpu.roll(zw, q_amt + np.int32(1), axis=0)
                rot_refs[w][:, cols, :] = jnp.where(sel, zq1, zq)[:C]

        ct1 = subq([rot_refs[w][:] for w in range(4)], acc)
        digits = _decompose128q(ct1, base_log, levels)  # l x (C,S,128)

        res_primes = []
        for pi in range(num_primes):
            p = _u32(primes[pi])
            pinv = _u32(int(plan.plans[pi].p_inv_neg32))
            fwd_digits = []
            for lev in range(levels):
                d = _digit_residue(digits[lev], p)
                fwd_digits.append(_ntt_fwd_lazy(d, tables, pi, fwd_refs))
            acc_cols = None
            for c in range(k1):
                col = None
                for lev in range(levels):
                    for r in range(k1):
                        key = bsk_ref[0, lev, r, c, pi][:, None, :]
                        fr = fwd_digits[lev].reshape(C, tb, k1, LANES)[:, :, r, :]
                        prod = mont_mul32(fr, key, p, pinv)
                        col = prod if col is None else add_mod32(col, prod, p)
                col = _ntt_inv_lazy(col, tables, pi, inv_refs)
                acc_cols = col[:, :, None, :] if acc_cols is None else jnp.concatenate(
                    [acc_cols, col[:, :, None, :]], axis=2)
            res_primes.append(acc_cols.reshape(C, S, LANES))

        # Garner mixed-radix digits (identical to v2/garner_to_u64)
        a_digits = [res_primes[0]]
        for j in range(1, num_primes):
            pj = _u32(primes[j])
            pinv_j = _u32(int(plan.plans[j].p_inv_neg32))
            v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
            for i in range(1, j):
                term = mont_mul32(a_digits[i], jnp.full(v.shape, _u32(pm_mont[(i - 1, j)]), U32), pj, pinv_j)
                vv = v + term
                v = jnp.where(vv >= pj, vv - pj, vv)
            r = res_primes[j]
            d = jnp.where(r >= v, r - v, r + pj - v)
            a_digits.append(
                mont_mul32(d, jnp.full(d.shape, _u32(inv_mont[j - 1]), U32), pj, pinv_j))
        # reconstruction mod 2^128 + sign correction (garner_to_u128 analog)
        zero = jnp.zeros_like(a_digits[0])
        out = [a_digits[0], zero, zero, zero]
        for i in range(1, num_primes):
            out = addq(out, _mulq_const128(a_digits[i], prods128q[i]))
        is_neg = a_digits[0] > _u32(half_digits[0])
        for i in range(1, num_primes):
            hd = _u32(half_digits[i])
            is_neg = (a_digits[i] > hd) | ((a_digits[i] == hd) & is_neg)
        pconst = [jnp.full(out[0].shape, _u32(pw), U32) for pw in p_mod128q]
        corr = subq(out, pconst)
        out = [jnp.where(is_neg, corr[w], out[w]) for w in range(4)]

        new = addq(acc, out)
        for w in range(4):
            acc_s[w][:] = new[w]

        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            for w in range(4):
                out_refs[w][:] = new[w]

    fwd_tabs = [f.reshape(num_primes, C, LANES) for f in tables.fwd]
    inv_tabs = [f.reshape(num_primes, C, LANES) for f in tables.inv]

    def run(w0, w1, w2, w3, adegs, bsk):
        batch_s = w0.shape[1]
        assert w0.shape == (C, batch_s, LANES), w0.shape
        assert batch_s % S == 0
        n_tiles = batch_s // S
        batch = batch_s // k1
        l = bsk.shape[1]
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, batch), lambda t, s: (s, z(t), z(t)),
                         memory_space=pltpu.SMEM),
        ]
        in_specs += [pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)),
                                  memory_space=vmem)] * 4
        in_specs += [
            pl.BlockSpec((1, l, k1, k1, num_primes, C, LANES),
                         lambda t, s: (s, z(t), z(t), z(t), z(t), z(t), z(t)),
                         memory_space=vmem),
        ]
        in_specs += [pl.BlockSpec((num_primes, C, LANES),
                                  lambda t, s: (z(t), z(t), z(t)),
                                  memory_space=vmem)] * (2 * num_stages)
        out_specs = [pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)),
                                  memory_space=vmem)] * 4
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((C, batch_s, LANES), U32)] * 4,
            scratch_shapes=[pltpu.VMEM((C, S, LANES), U32)] * 8,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )
        return call(adegs.reshape(n_steps, 1, batch), w0, w1, w2, w3, bsk,
                    *fwd_tabs, *inv_tabs)

    return run
