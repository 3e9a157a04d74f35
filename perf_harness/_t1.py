import sys, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, server
N, P, K1, LEV, BL = 512, 4, 2, 1, 23
n_in, B = 4, 8
rng = np.random.default_rng(0)
plan = ntt.make_plan(N, P)
bsk = np.zeros((n_in, LEV, K1, K1, P, N), dtype=np.uint32)
for pi in range(P):
    bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (n_in, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64)
mask = rng.integers(0, 2*N, (B, n_in), dtype=np.uint64)
body = rng.integers(0, 2*N, (B,), dtype=np.uint64)
wx = server.blind_rotate(jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut), jnp.asarray(bsk), plan, BL, LEV)
wp = server.blind_rotate_pallas(jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut), jnp.asarray(bsk), plan, BL, LEV, tb=8)
print("match on TPU:", np.array_equal(np.asarray(wx), np.asarray(wp)))
