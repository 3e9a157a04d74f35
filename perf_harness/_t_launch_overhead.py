"""Where do the extra 150us/launch go? Chain 16 kernel calls in one jit."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, pallas_ntt

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
plan = ntt.make_plan(N, P)
rng = np.random.default_rng(0)
bsk1 = np.zeros((LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk1[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
step = pallas_ntt.build_cmux_step(N, P, BL, LEV, K1, TB)
lo = jnp.asarray(rng.integers(0, 2**32, (TB, K1, N), dtype=np.uint64).astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 2**32, (TB, K1, N), dtype=np.uint64).astype(np.uint32))
adeg = jnp.asarray(rng.integers(0, 2*N, (TB,), dtype=np.int64).astype(np.int32))
bskj = jnp.asarray(bsk1)

def chain(lo, hi, adeg, bsk, n):
    for _ in range(n):
        lo, hi = step(lo, hi, adeg, bsk)
    return lo, hi

for n in [1, 16]:
    f = jax.jit(lambda a,b,c,d,n=n: chain(a,b,c,d,n))
    o = f(lo, hi, adeg, bskj); jax.block_until_ready(o)
    t0=time.time(); iters=10
    for _ in range(iters):
        o = f(lo, hi, adeg, bskj)
    jax.block_until_ready(o)
    dt=(time.time()-t0)/iters
    print(f"chain {n}: {dt*1e6:.0f} us total, {dt*1e6/n:.0f} us/launch", flush=True)

# scan over 918 steps with ONE tile (tb=8 batch)
bsk_full = np.zeros((918, LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk_full[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (918, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
bskf = jnp.asarray(bsk_full)
adegs = jnp.asarray(rng.integers(0, 2*N, (918, TB), dtype=np.int64).astype(np.int32))

def scanfn(lo, hi, adegs, bsk):
    def body(c, xs):
        l, h = c
        a, bs = xs
        l, h = step(l, h, a, bs)
        return (l, h), None
    (l, h), _ = jax.lax.scan(body, (lo, hi), (adegs, bsk))
    return l, h

f = jax.jit(scanfn)
t0=time.time(); o = f(lo, hi, adegs, bskf); jax.block_until_ready(o); print("scan compile:", round(time.time()-t0,1), flush=True)
t0=time.time(); iters=3
for _ in range(iters):
    o = f(lo, hi, adegs, bskf)
jax.block_until_ready(o)
dt=(time.time()-t0)/iters
print(f"scan918 x1tile: {dt*1000:.0f} ms -> {dt*1e6/918:.0f} us/step -> {TB/(dt):.0f} PBS/s at B=8", flush=True)
