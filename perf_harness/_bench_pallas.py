import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tfhe_tpu.ops import ntt, server

N, P, K1, LEV, BL = 2048, 4, 2, 1, 23
n_in = 918
B = 256
rng = np.random.default_rng(0)
plan = ntt.make_plan(N, P)
bsk = np.zeros((n_in, LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (n_in, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64)
mask = rng.integers(0, 2*N, (B, n_in), dtype=np.uint64)
body = rng.integers(0, 2*N, (B,), dtype=np.uint64)
maskj, bodyj, lutj, bskj = map(jnp.asarray, (mask, body, lut, bsk))

# small-n correctness on real hw first
small = 4
f_x = jax.jit(lambda m,b,l,k: server.blind_rotate(m,b,l,k,plan,BL,LEV))
f_p = jax.jit(lambda m,b,l,k: server.blind_rotate_pallas(m,b,l,k,plan,BL,LEV,tb=32))
t0=time.time(); wx = f_x(maskj[:, :small], bodyj, lutj, bskj[:small]); wx.block_until_ready(); print("xla compile+run", time.time()-t0)
t0=time.time(); wp = f_p(maskj[:, :small], bodyj, lutj, bskj[:small]); wp.block_until_ready(); print("pallas compile+run", time.time()-t0)
print("match on TPU:", np.array_equal(np.asarray(wx), np.asarray(wp)))

for name, f in [("xla", f_x), ("pallas", f_p)]:
    t0=time.time(); r = f(maskj, bodyj, lutj, bskj); r.block_until_ready(); print(f"{name} full compile+run: {time.time()-t0:.1f}s")
    t0=time.time(); iters=2
    for _ in range(iters):
        r = f(maskj, bodyj, lutj, bskj)
    r.block_until_ready()
    dt=(time.time()-t0)/iters
    print(f"{name}: {dt*1000:.0f} ms/batch{B} -> {B/dt:.0f} PBS/s (blind rotate only)")
