import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("backend:", jax.default_backend(), jax.devices())
from tfhe_tpu.ops import ntt, server

plan = ntt.make_plan(2048, 4)
B = 256
rng = np.random.default_rng(0)

def bench(name, f, *args, iters=10):
    f_jit = jax.jit(f)
    r = f_jit(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = f_jit(*args)
        jax.block_until_ready(r)
    dt = (time.time()-t0)/iters
    print(f"{name:28s} {dt*1000:9.3f} ms")
    return dt

x = jnp.asarray(rng.integers(0, 1811939329, (B, 2, 4, 2048), dtype=np.uint64))
digits_in = jnp.asarray(rng.integers(0, 2**63, (B, 2, 2048), dtype=np.uint64))
t_fwd = bench("ntt_forward_stacked", lambda a: ntt.ntt_forward_stacked(a, plan, jnp), x)
t_inv = bench("ntt_inverse_stacked", lambda a: ntt.ntt_inverse_stacked(a, plan, jnp), x)
t_gar = bench("garner", lambda a: ntt.garner_to_u64(a, plan, jnp), x)
t_dec = bench("decompose+residues", lambda a: server._digits_to_residues(server.signed_decompose(a, 23, 1), plan), digits_in)
t_pw  = bench("pointwise+add", lambda a: ntt.add_mod_stacked(ntt.pointwise_mul_mont_stacked(a, a, plan, jnp), a, plan, jnp), x)
ct = jnp.asarray(rng.integers(0, 2**63, (B, 2049), dtype=np.uint64))
ksk = jnp.asarray(rng.integers(0, 2**63, (2048, 4, 919), dtype=np.uint64))
t_ks = bench("keyswitch(B,2048->918,l4)", lambda c, k: server.keyswitch(c, k, 4, 4), ct, ksk, iters=3)
lut = jnp.zeros((B, 2, 2048), dtype=jnp.uint64)
t_mono = bench("monomial_mul", lambda a: server.monomial_mul(a, jnp.ones((B,1,1), dtype=jnp.uint64)*3), lut)
step = t_dec + t_fwd + t_pw + t_inv + t_gar + t_mono*2
print(f"est. scan step: {step*1000:.2f} ms; x918 = {step*918:.1f} s per batch of {B}")
print(f"-> est PBS/s = {B/(step*918 + t_ks):.1f}")
