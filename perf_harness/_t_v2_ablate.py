"""v2 ablations: time full / no-rot / ntt-only / mulwide-microbench."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tfhe_tpu.ops import ntt as ntt_mod
from tfhe_tpu.ops.pallas_ntt import (LANES, U32, _u32, add64, sub64, neg64,
    mulwide, mont_mul32, add_mod32, _decompose32, _digit_residue,
    make_stage_tables, _ntt_fwd_v2, _ntt_inv_v2)

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
NSTEPS = 64
C = N // LANES
S = TB * K1
tables = make_stage_tables(N, P)
plan = ntt_mod.make_plan(N, P)
primes = [int(p) for p in plan.primes]
num_stages = 11

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
            y_lo = jnp.concatenate([acc_lo, neg_lo], axis=0)
            y_hi = jnp.concatenate([acc_hi, neg_hi], axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (2*C, K1, LANES), 2)
            for el in range(TB):
                a = adeg_ref[0, 0, t * TB + el]
                q_amt = jax.lax.div(a, np.int32(LANES))
                rl = jax.lax.rem(a, np.int32(LANES))
                cols = slice(el*K1, (el+1)*K1)
                zl = pltpu.roll(y_lo[:, cols, :], rl, axis=2)
                zh = pltpu.roll(y_hi[:, cols, :], rl, axis=2)
                zl_q = pltpu.roll(zl, q_amt, axis=0)
                zh_q = pltpu.roll(zh, q_amt, axis=0)
                zl_q1 = pltpu.roll(zl, q_amt + np.int32(1), axis=0)
                zh_q1 = pltpu.roll(zh, q_amt + np.int32(1), axis=0)
                sel = lane < rl
                rot_lo_ref[:, cols, :] = jnp.where(sel, zl_q1, zl_q)[:C]
                rot_hi_ref[:, cols, :] = jnp.where(sel, zh_q1, zh_q)[:C]
            ct1_lo, ct1_hi = sub64(rot_lo_ref[:], rot_hi_ref[:], acc_lo, acc_hi)
        else:
            ct1_lo, ct1_hi = acc_lo, acc_hi
        if variant == "rot_only":
            new_lo, new_hi = ct1_lo, ct1_hi
        elif variant == "mul_only":
            # raw mulwide throughput probe: 16 chained mulwides on the acc
            x, y = acc_lo, acc_hi
            for _ in range(16):
                x, y = mulwide(x ^ y, x | y)
            new_lo, new_hi = x, y
        else:
            digits = _decompose32(ct1_lo, ct1_hi, BL, LEV)
            outs = []
            for pi in range(P):
                p = _u32(primes[pi])
                pinv = _u32(int(plan.plans[pi].p_inv_neg32))
                d = _digit_residue(digits[0], p)
                f = _ntt_fwd_v2(d, tables, pi, fwd_refs)
                if variant == "ntt_only":
                    col = f.reshape(C, TB, K1, LANES)[:, :, 0, :]
                else:
                    col = None
                    for r in range(K1):
                        key = bsk_ref[0, 0, r, 0, pi][:, None, :]
                        fr = f.reshape(C, TB, K1, LANES)[:, :, r, :]
                        prod = mont_mul32(fr, key, p, pinv)
                        col = prod if col is None else add_mod32(col, prod, p)
                    # second column too for realism
                    col2 = None
                    for r in range(K1):
                        key = bsk_ref[0, 0, r, 1, pi][:, None, :]
                        fr = f.reshape(C, TB, K1, LANES)[:, :, r, :]
                        prod = mont_mul32(fr, key, p, pinv)
                        col2 = prod if col2 is None else add_mod32(col2, prod, p)
                    col = add_mod32(col, col2, p)
                col = _ntt_inv_v2(col, tables, pi, inv_refs)
                outs.append(col)
            total = outs[0]
            for o in outs[1:]:
                total = total + o
            pad = jnp.concatenate([total[:, :, None, :]]*K1, axis=2).reshape(C, S, LANES)
            new_lo, new_hi = add64(acc_lo, acc_hi, pad, jnp.zeros_like(pad))
        acc_lo_s[:] = new_lo
        acc_hi_s[:] = new_hi
        @pl.when(s == pl.num_programs(1) - 1)
        def _():
            out_lo_ref[:] = new_lo
            out_hi_ref[:] = new_hi

    fwd_tabs = [f.reshape(P, C, LANES) for f in tables.fwd]
    inv_tabs = [f.reshape(P, C, LANES) for f in tables.inv]
    def run(acc_lo, acc_hi, adegs, bsk):
        vmem = pltpu.VMEM
        z = lambda t: t * 0
        in_specs = [
            pl.BlockSpec((1, 1, TB), lambda t, s: (s, z(t), z(t)), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)), memory_space=vmem),
            pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)), memory_space=vmem),
            pl.BlockSpec((1, LEV, K1, K1, P, C, LANES), lambda t, s: (s, z(t), z(t), z(t), z(t), z(t), z(t)), memory_space=vmem),
        ]
        in_specs += [pl.BlockSpec((P, C, LANES), lambda t, s: (z(t), z(t), z(t)), memory_space=vmem)] * (2*num_stages)
        out_specs = [pl.BlockSpec((C, S, LANES), lambda t, s: (z(t), t, z(t)), memory_space=vmem)] * 2
        call = pl.pallas_call(kernel, grid=(1, NSTEPS), in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((C, S, LANES), U32)] * 2,
            scratch_shapes=[pltpu.VMEM((C, S, LANES), U32)] * 4,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024,
                dimension_semantics=("arbitrary", "arbitrary")))
        return call(adegs.reshape(NSTEPS, 1, TB), acc_lo, acc_hi, bsk, *fwd_tabs, *inv_tabs)
    return run

rng = np.random.default_rng(0)
bsk = np.zeros((NSTEPS, LEV, K1, K1, P, C, LANES), dtype=np.uint32)
for pi in range(P):
    bsk[..., pi, :, :] = rng.integers(0, primes[pi], (NSTEPS, LEV, K1, K1, C, LANES), dtype=np.uint64).astype(np.uint32)
lo = jnp.asarray(rng.integers(0, 1<<32, (C, S, LANES), dtype=np.uint64).astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 1<<32, (C, S, LANES), dtype=np.uint64).astype(np.uint32))
adegs = jnp.asarray(rng.integers(0, 2*N, (NSTEPS, TB), dtype=np.int64).astype(np.int32))
bskj = jnp.asarray(bsk)

for variant in ["rot_only", "mul_only", "ntt_only", "no_rot", "full"]:
    run = build(variant)
    f = jax.jit(run)
    t0=time.time(); o = f(lo, hi, adegs, bskj); _ = np.asarray(o[0]); tc = time.time()-t0
    ts = []
    for i in range(5):
        lo2 = jnp.asarray(rng.integers(0, 1<<32, (C, S, LANES), dtype=np.uint64).astype(np.uint32))
        t0 = time.time(); o = f(lo2, hi, adegs, bskj); _ = np.asarray(o[0])
        ts.append(time.time()-t0)
    med = sorted(ts)[2]
    print(f"{variant:9s}: compile {tc:4.0f}s, run {med*1000:6.1f} ms -> {(med-0.030)*1e6/NSTEPS:6.1f} us/step", flush=True)
