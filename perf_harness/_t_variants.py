"""Isolate kernel cost: full vs no-rotation vs NTT-only vs rotation-only.

Builds 4 gridded kernels with pieces stubbed, times each at tb=8, 64 steps.
"""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tfhe_tpu.ops import ntt as ntt_mod
from tfhe_tpu.ops.pallas_ntt import (LANES, U32, _u32, add64, sub64, neg64,
    mulwide, mont_mul32, add_mod32, _decompose32, _digit_residue,
    make_stage_tables, ntt_fwd_inkernel, ntt_inv_inkernel)

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
NSTEPS = 64
tables = make_stage_tables(N, P)
plan = ntt_mod.make_plan(N, P)
gc = ntt_mod._garner_consts(plan.primes)
num_stages = 11
primes = [int(p) for p in plan.primes]
inv_mont = [int(gc[f"inv_mont_{j}"]) for j in range(1, P)]
pm_mont = {k: int(v) for k, v in gc["pm_mont"].items()}
prods64 = [int(v) for v in gc["prods64"]]
half_digits = [int(v) for v in gc["half_digits"]]
p_mod64 = int(gc["P_mod64"])

def build(variant):
    def kernel(*refs):
        adeg_ref = refs[0]
        acc_lo_in, acc_hi_in = refs[1], refs[2]
        bsk_ref = refs[3]
        fwd_refs = refs[4:4+num_stages]
        inv_refs = refs[4+num_stages:4+2*num_stages]
        out_lo_ref, out_hi_ref = refs[4+2*num_stages], refs[5+2*num_stages]
        acc_lo_s, acc_hi_s = refs[6+2*num_stages], refs[7+2*num_stages]
        rot_lo_ref, rot_hi_ref = refs[8+2*num_stages], refs[9+2*num_stages]
        t = pl.program_id(0)
        s = pl.program_id(1)
        @pl.when(s == 0)
        def _():
            acc_lo_s[:] = acc_lo_in[:]
            acc_hi_s[:] = acc_hi_in[:]
        acc_lo = acc_lo_s[:]
        acc_hi = acc_hi_s[:]
        if variant in ("full", "rot_only"):
            neg_lo, neg_hi = neg64(acc_lo, acc_hi)
            y_lo = jnp.concatenate([acc_lo, neg_lo], axis=-1)
            y_hi = jnp.concatenate([acc_hi, neg_hi], axis=-1)
            for el in range(TB):
                a = adeg_ref[0, 0, el]
                rot_lo_ref[el] = pltpu.roll(y_lo[el], a, axis=1)[:, :N]
                rot_hi_ref[el] = pltpu.roll(y_hi[el], a, axis=1)[:, :N]
            ct1_lo, ct1_hi = sub64(rot_lo_ref[:], rot_hi_ref[:], acc_lo, acc_hi)
        else:
            ct1_lo, ct1_hi = acc_lo, acc_hi
        if variant == "rot_only":
            acc_lo_s[:] = ct1_lo
            acc_hi_s[:] = ct1_hi
            new_lo, new_hi = ct1_lo, ct1_hi
        else:
            digits = _decompose32(ct1_lo, ct1_hi, BL, LEV)
            res_primes = []
            for pi in range(P):
                p = _u32(primes[pi])
                pinv = _u32(int(plan.plans[pi].p_inv_neg32))
                fwd_digits = []
                for lev in range(LEV):
                    d = _digit_residue(digits[lev], p)
                    fwd_digits.append(ntt_fwd_inkernel(d, tables, pi, fwd_refs))
                acc_cols = None
                for c in range(K1):
                    if variant == "ntt_only":
                        col = fwd_digits[0][:, c, :]
                    else:
                        col = None
                        for lev in range(LEV):
                            for r in range(K1):
                                key = bsk_ref[0, lev, r, c, pi]
                                prod = mont_mul32(fwd_digits[lev][:, r, :], key, p, pinv)
                                col = prod if col is None else add_mod32(col, prod, p)
                    col = ntt_inv_inkernel(col, tables, pi, inv_refs)
                    acc_cols = col[:, None, :] if acc_cols is None else jnp.concatenate([acc_cols, col[:, None, :]], axis=1)
                res_primes.append(acc_cols)
            if variant == "ntt_only":
                new_lo = res_primes[0] + res_primes[1] + res_primes[2] + res_primes[3]
                new_hi = acc_hi
            else:
                a_digits = [res_primes[0]]
                for j in range(1, P):
                    pj = _u32(primes[j])
                    pinv_j = _u32(int(plan.plans[j].p_inv_neg32))
                    v = jnp.where(a_digits[0] >= pj, a_digits[0] - pj, a_digits[0])
                    for i in range(1, j):
                        term = mont_mul32(a_digits[i], jnp.full(v.shape, _u32(pm_mont[(i-1, j)]), U32), pj, pinv_j)
                        vv = v + term
                        v = jnp.where(vv >= pj, vv - pj, vv)
                    r = res_primes[j]
                    d = jnp.where(r >= v, r - v, r + pj - v)
                    a_digits.append(mont_mul32(d, jnp.full(d.shape, _u32(inv_mont[j-1]), U32), pj, pinv_j))
                out_lo = a_digits[0]
                out_hi = jnp.zeros_like(out_lo)
                for i in range(1, P):
                    cc = prods64[i]
                    c_lo, c_hi = _u32(cc & 0xFFFFFFFF), _u32((cc >> 32) & 0xFFFFFFFF)
                    t_lo, t_hi = mulwide(a_digits[i], jnp.full(out_lo.shape, c_lo, U32))
                    t_hi = t_hi + a_digits[i] * c_hi
                    out_lo, out_hi = add64(out_lo, out_hi, t_lo, t_hi)
                is_neg = a_digits[0] > _u32(half_digits[0])
                for i in range(1, P):
                    hd = _u32(half_digits[i])
                    is_neg = (a_digits[i] > hd) | ((a_digits[i] == hd) & is_neg)
                pm_lo, pm_hi = _u32(p_mod64 & 0xFFFFFFFF), _u32((p_mod64 >> 32) & 0xFFFFFFFF)
                corr_lo, corr_hi = sub64(out_lo, out_hi, jnp.full(out_lo.shape, pm_lo, U32), jnp.full(out_lo.shape, pm_hi, U32))
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
        n_tiles = batch // TB
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, batch), lambda t, s: (s, z(t), z(t)), memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, K1, N), lambda t, s: (t, z(t), z(t)), memory_space=vmem),
            pl.BlockSpec((TB, K1, N), lambda t, s: (t, z(t), z(t)), memory_space=vmem),
            pl.BlockSpec((1, LEV, K1, K1, P, N), lambda t, s: (s, z(t), z(t), z(t), z(t), z(t)), memory_space=vmem),
        ]
        in_specs += [pl.BlockSpec((P, N), lambda t, s: (z(t), z(t)), memory_space=vmem)] * (2*num_stages)
        out_specs = [pl.BlockSpec((TB, K1, N), lambda t, s: (t, z(t), z(t)), memory_space=vmem)] * 2
        call = pl.pallas_call(kernel, grid=(n_tiles, NSTEPS), in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((batch, K1, N), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((TB, K1, N), U32)] * 4,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024,
                dimension_semantics=("arbitrary", "arbitrary")))
        return call(adegs.reshape(NSTEPS, 1, batch), acc_lo, acc_hi, bsk, *fwd_tabs, *inv_tabs)
    return run

rng = np.random.default_rng(0)
bsk = np.zeros((NSTEPS, LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk[..., pi, :] = rng.integers(0, primes[pi], (NSTEPS, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
lo = jnp.asarray(rng.integers(0, 1<<32, (TB, K1, N), dtype=np.uint64).astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 1<<32, (TB, K1, N), dtype=np.uint64).astype(np.uint32))
adegs = jnp.asarray(rng.integers(0, 2*N, (NSTEPS, TB), dtype=np.int64).astype(np.int32))
bskj = jnp.asarray(bsk)

for variant in ["rot_only", "ntt_only", "no_rot", "full"]:
    run = build(variant)
    f = jax.jit(run)
    t0=time.time(); o = f(lo, hi, adegs, bskj); _ = np.asarray(o[0])
    tc = time.time()-t0
    ts = []
    rng2 = np.random.default_rng(9)
    for i in range(5):
        lo2 = jnp.asarray(rng2.integers(0, 1<<32, (TB, K1, N), dtype=np.uint64).astype(np.uint32))
        t0 = time.time()
        o = f(lo2, hi, adegs, bskj)
        _ = np.asarray(o[0])
        ts.append(time.time()-t0)
    med = sorted(ts)[2]
    print(f"{variant:10s}: compile {tc:5.0f}s, run {med*1000:6.1f} ms -> {(med-0.0315)*1e6/NSTEPS:7.1f} us/step-ish (tb={TB})", flush=True)
