"""v2 chunk-layout kernel: correctness vs XLA + honest timing."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from tfhe_tpu.ops import ntt, server, pallas_ntt

N, P, K1, LEV, BL, TB = 2048, 4, 2, 1, 23, 8
plan = ntt.make_plan(N, P)
rng = np.random.default_rng(0)

def mk(n_in, B):
    bsk = np.zeros((n_in, LEV, K1, K1, P, N), dtype=np.uint32)
    for pi in range(P):
        bsk[..., pi, :] = rng.integers(0, int(plan.plans[pi].p), (n_in, LEV, K1, K1, N), dtype=np.uint64).astype(np.uint32)
    lut = rng.integers(0, 2**63, (B, K1, N), dtype=np.uint64)
    mask = rng.integers(0, 2*N, (B, n_in), dtype=np.uint64)
    body = rng.integers(0, 2*N, (B,), dtype=np.uint64)
    return map(jnp.asarray, (mask, body, lut, bsk))

def v2_br(maskj, bodyj, lutj, bskj, tb):
    n_in = bskj.shape[0]
    b, k1, n = lutj.shape
    acc0 = server.monomial_div(lutj, bodyj[:, None, None])
    lo0 = pallas_ntt.to_chunk_layout((acc0 & np.uint64(0xFFFFFFFF)).astype(jnp.uint32), k1, n)
    hi0 = pallas_ntt.to_chunk_layout((acc0 >> np.uint64(32)).astype(jnp.uint32), k1, n)
    bsk_c = bskj.reshape(*bskj.shape[:-1], n // 128, 128)
    run = pallas_ntt.build_blind_rotate_v2(n, P, BL, LEV, k1, tb, n_in)
    lo, hi = run(lo0, hi0, maskj.T.astype(jnp.int32), bsk_c)
    lo = pallas_ntt.from_chunk_layout(lo, b, k1, n)
    hi = pallas_ntt.from_chunk_layout(hi, b, k1, n)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))

maskj, bodyj, lutj, bskj = mk(8, 16)
t0=time.time()
got = np.asarray(jax.jit(lambda m,b,l,k: v2_br(m,b,l,k,TB))(maskj, bodyj, lutj, bskj))
print(f"v2 small compile+run {time.time()-t0:.0f}s", flush=True)
ref = np.asarray(jax.jit(lambda m,b,l,k: server.blind_rotate(m,b,l,k,plan,BL,LEV))(maskj, bodyj, lutj, bskj))
print("v2 == xla:", np.array_equal(got, ref), flush=True)

maskj, bodyj, lutj, bskj = mk(918, 128)
f = jax.jit(lambda m,b,l,k: v2_br(m,b,l,k,TB))
t0=time.time(); o = f(maskj, bodyj, lutj, bskj); _ = np.asarray(o); print(f"full compile {time.time()-t0:.0f}s", flush=True)
ts=[]
for i in range(4):
    m2 = jnp.asarray(rng.integers(0, 2*N, (128, 918), dtype=np.uint64))
    t0=time.time(); o = f(m2, bodyj, lutj, bskj); _ = np.asarray(o)
    ts.append(time.time()-t0)
med = sorted(ts)[len(ts)//2]
print(f"v2 blind rotate B=128: {med*1000:.0f} ms -> {128/med:.0f} PBS/s", flush=True)
