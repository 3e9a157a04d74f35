"""Trustworthy timing: varied inputs per iteration + per-iter block; slope
between 64-step and 918-step kernels gives per-step device time."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, server, pallas_ntt

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
plan = ntt.make_plan(N, P)
rng = np.random.default_rng(0)

def measure(nsteps, batch, iters=6):
    bsk = np.zeros((nsteps, LEV, K1, K1, P, N), dtype=np.uint32)
    for pi in range(P):
        bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (nsteps, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
    bskj = jnp.asarray(bsk)
    run = pallas_ntt.build_blind_rotate(N, P, BL, LEV, K1, TB, nsteps)
    f = jax.jit(run)
    los = [jnp.asarray(rng.integers(0, 1<<32, (batch, K1, N), dtype=np.uint64).astype(np.uint32)) for _ in range(iters+1)]
    his = [jnp.asarray(rng.integers(0, 1<<32, (batch, K1, N), dtype=np.uint64).astype(np.uint32)) for _ in range(iters+1)]
    ads = [jnp.asarray(rng.integers(0, 2*N, (nsteps, batch), dtype=np.int64).astype(np.int32)) for _ in range(iters+1)]
    o = f(los[-1], his[-1], ads[-1], bskj); _ = np.asarray(o[0])
    ts = []
    for i in range(iters):
        t0 = time.time()
        o = f(los[i], his[i], ads[i], bskj)
        _ = np.asarray(o[0])  # block_until_ready lies through the axon tunnel
        ts.append(time.time()-t0)
    med = sorted(ts)[len(ts)//2]
    print(f"nsteps={nsteps} B={batch}: median {med*1000:.1f} ms (all: {[round(t*1000,1) for t in ts]})", flush=True)
    return med

t64 = measure(64, 8)
t918 = measure(918, 8)
per_step = (t918 - t64) / (918 - 64)
print(f"per-step device time (tb=8): {per_step*1e6:.1f} us -> {8/(per_step*918):.0f} PBS/s-equiv at B=8", flush=True)
t918b = measure(918, 128)
print(f"B=128: {128/t918b:.0f} PBS/s (blind-rotate only)", flush=True)
