import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, server, pallas_ntt

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
n_in = 64   # short scan for correctness
plan = ntt.make_plan(N, P)
rng = np.random.default_rng(0)
bsk = np.zeros((n_in, LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (n_in, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
lut = rng.integers(0, 2**63, (TB, K1, N), dtype=np.uint64)
mask = rng.integers(0, 2*N, (TB, n_in), dtype=np.uint64)
body = rng.integers(0, 2*N, (TB,), dtype=np.uint64)
maskj, bodyj, lutj, bskj = map(jnp.asarray, (mask, body, lut, bsk))

step = pallas_ntt.build_cmux_step(N, P, BL, LEV, K1, TB)
acc0 = server.monomial_div(lutj, bodyj[:, None, None])
lo0 = (acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
hi0 = (acc0 >> np.uint64(32)).astype(jnp.uint32)
adegs = maskj.T.astype(jnp.int32)

def scanfn(lo, hi, adegs, bsk):
    def bodyf(c, xs):
        l, h = c
        a, bs = xs
        l, h = step(l, h, a, bs)
        return (l, h), None
    (l, h), _ = jax.lax.scan(bodyf, (lo, hi), (adegs, bsk))
    return l.astype(jnp.uint64) | (h.astype(jnp.uint64) << np.uint64(32))

f = jax.jit(scanfn)
got = np.asarray(f(lo0, hi0, adegs, bskj))
ref = np.asarray(jax.jit(lambda m,b,l,k: server.blind_rotate(m,b,l,k,plan,BL,LEV))(maskj, bodyj, lutj, bskj))
print("scan pallas == xla:", np.array_equal(got, ref), flush=True)

t0=time.time(); iters=5
for _ in range(iters):
    o = f(lo0, hi0, adegs, bskj)
jax.block_until_ready(o)
dt=(time.time()-t0)/iters
print(f"scan{n_in} x1tile: {dt*1000:.2f} ms -> {dt*1e6/n_in:.1f} us/step", flush=True)
