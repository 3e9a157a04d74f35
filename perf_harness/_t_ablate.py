"""Ablations on the gridded kernel: tb sweep + prime-count scaling."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, server, pallas_ntt

N, K1, LEV, BL = 2048, 2, 1, 23
n_in = 64
rng = np.random.default_rng(0)

def bench(P, TB, B):
    plan = ntt.make_plan(N, P)
    bsk = np.zeros((n_in, LEV, K1, K1, P, N), dtype=np.uint32)
    for pi in range(P):
        bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (n_in, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
    lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64)
    mask = rng.integers(0, 2*N, (B, n_in), dtype=np.uint64)
    body = rng.integers(0, 2*N, (B,), dtype=np.uint64)
    maskj, bodyj, lutj, bskj = map(jnp.asarray, (mask, body, lut, bsk))
    def f_(m, b, l, k):
        acc0 = server.monomial_div(l, b[:, None, None])
        lo0 = (acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi0 = (acc0 >> np.uint64(32)).astype(jnp.uint32)
        run = pallas_ntt.build_blind_rotate(N, P, BL, LEV, K1, TB, n_in)
        lo, hi = run(lo0, hi0, m.T.astype(jnp.int32), k)
        return lo, hi
    f = jax.jit(f_)
    t0=time.time(); o = f(maskj, bodyj, lutj, bskj); jax.block_until_ready(o)
    tc = time.time()-t0
    t0=time.time(); iters=5
    for _ in range(iters):
        o = f(maskj, bodyj, lutj, bskj)
    jax.block_until_ready(o)
    dt=(time.time()-t0)/iters
    us_step = dt*1e6/(n_in*(B//TB))
    print(f"P={P} tb={TB} B={B}: compile {tc:.0f}s, {us_step:.1f} us/tile-step, {us_step/TB:.2f} us/elem-step -> proj {1e6/ (us_step/TB*918):.0f} PBS/s", flush=True)

bench(4, 8, 64)
bench(1, 8, 64)
bench(4, 16, 64)
bench(4, 32, 64)
