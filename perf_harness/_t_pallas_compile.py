"""Probe: Mosaic compile time of the CMux step kernel vs batch tile size."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, pallas_ntt

N, P, K1, LEV, BL = 2048, 4, 2, 1, 23
plan = ntt.make_plan(N, P)
rng = np.random.default_rng(0)
bsk1 = np.zeros((LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk1[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)

for tb in [1, 4, 8]:
    step = pallas_ntt.build_cmux_step(N, P, BL, LEV, K1, tb)
    lo = jnp.asarray(rng.integers(0, 2**32, (tb, K1, N), dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, (tb, K1, N), dtype=np.uint64).astype(np.uint32))
    adeg = jnp.asarray(rng.integers(0, 2*N, (tb,), dtype=np.int64).astype(np.int32))
    bskj = jnp.asarray(bsk1)
    f = jax.jit(lambda a,b,c,d: step(a,b,c,d))
    t0 = time.time()
    o = f(lo, hi, adeg, bskj); jax.block_until_ready(o)
    t_compile = time.time()-t0
    t0 = time.time(); iters = 20
    for _ in range(iters):
        o = f(lo, hi, adeg, bskj)
    jax.block_until_ready(o)
    dt = (time.time()-t0)/iters
    print(f"tb={tb}: compile+first {t_compile:.1f}s, steady {dt*1e6:.0f} us/step -> {tb/(dt*918):.1f} PBS/s equiv", flush=True)
