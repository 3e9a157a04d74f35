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

f16 = jax.jit(lambda a,b,c,d: chain(a,b,c,d,16))
got = f16(lo, hi, adeg, bskj)
# eager reference: 16 sequential jit-of-one-step calls
f1 = jax.jit(lambda a,b,c,d: chain(a,b,c,d,1))
rl, rh = lo, hi
for _ in range(16):
    rl, rh = f1(rl, rh, adeg, bskj)
print("chain16 correct:", np.array_equal(np.asarray(got[0]), np.asarray(rl)) and np.array_equal(np.asarray(got[1]), np.asarray(rh)), flush=True)

# timing with per-iter block
for name, f, n in [("one", f1, 1), ("sixteen", f16, 16)]:
    o = f(lo, hi, adeg, bskj); jax.block_until_ready(o)
    t0=time.time(); iters=20
    for _ in range(iters):
        o = f(lo, hi, adeg, bskj)
        jax.block_until_ready(o)
    dt=(time.time()-t0)/iters
    print(f"{name}: {dt*1e6:.0f} us/call -> {dt*1e6/n:.1f} us/launch", flush=True)
