import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tfhe_tpu.ops import ntt
plan = ntt.make_plan(2048, 4)
B=256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1811939329, (B, 2, 4, 2048), dtype=np.uint64))

def bench(name, f, *args, iters=10):
    fj = jax.jit(f); r = fj(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(iters):
        r = fj(*args); jax.block_until_ready(r)
    print(f"{name:24s} {(time.time()-t0)/iters*1000:8.3f} ms")

# single GS stage at various t
def gs_stage(x, h, t):
    ps = jnp.asarray(plan.ps); pinvs = jnp.asarray(plan.pinvs)
    psi = jnp.asarray(plan.psi_inv_br_stack)
    bs = x.shape[:-2]; nb = len(bs); P=4
    xv = x.reshape(bs + (P, h, 2, t))
    u = xv[..., 0, :]; v = xv[..., 1, :]
    s = psi[:, h:2*h].reshape((1,)*nb + (P, h, 1))
    pb = ps.reshape((1,)*nb + (P,1,1)); pib = pinvs.reshape((1,)*nb + (P,1,1))
    lo = ntt._add_mod(u, v, pb, jnp)
    hi = ntt.mont_mul(ntt._sub_mod(u, v, pb, jnp), s, pb, pib, jnp)
    return jnp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2).reshape(bs + (P, 2048))

for t in [1, 4, 16, 64, 256, 1024]:
    h = 2048 // (2*t)
    bench(f"gs stage t={t}", lambda a, h=h, t=t: gs_stage(a, h, t), x)
# CT stage (forward style)
def ct_stage(x, m, t):
    ps = jnp.asarray(plan.ps); pinvs = jnp.asarray(plan.pinvs)
    psi = jnp.asarray(plan.psi_br_stack)
    bs = x.shape[:-2]; nb = len(bs); P=4
    xv = x.reshape(bs + (P, m, 2, t))
    u = xv[..., 0, :]
    s = psi[:, m:2*m].reshape((1,)*nb + (P, m, 1))
    pb = ps.reshape((1,)*nb + (P,1,1)); pib = pinvs.reshape((1,)*nb + (P,1,1))
    v = ntt.mont_mul(xv[..., 1, :], s, pb, pib, jnp)
    return jnp.concatenate([ntt._add_mod(u,v,pb,jnp)[..., None, :], ntt._sub_mod(u,v,pb,jnp)[..., None, :]], axis=-2).reshape(bs + (P, 2048))
for t in [1, 16, 1024]:
    m = 2048 // (2*t)
    bench(f"ct stage t={t}", lambda a, m=m, t=t: ct_stage(a, m, t), x)
