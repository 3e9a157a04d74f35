import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu.ops import server128

np.seterr(over="ignore")
M = 1 << 128
N = 16
rng = np.random.default_rng(0)
vals = [int(a) | (int(b) << 64) for a, b in zip(
    rng.integers(0, 1<<63, N, dtype=np.uint64), rng.integers(0, 1<<63, N, dtype=np.uint64))]

def model_mul(poly, d):
    out = [0]*N
    for j in range(N):
        k = j + d
        sign = 1
        while k >= N:
            k -= N; sign = -sign
        out[k] = (out[k] + sign*poly[j]) % M
    return out

lo = jnp.asarray(np.array([v & ((1<<64)-1) for v in vals], np.uint64))[None, None]
hi = jnp.asarray(np.array([v >> 64 for v in vals], np.uint64))[None, None]
ok_mul = ok_div = True
for d in [0, 1, 5, N-1, N, N+3, 2*N-1]:
    dd = jnp.full((1,1,1), d, dtype=jnp.uint64)
    rl, rh = server128.monomial_mul128(lo, hi, dd)
    got = [int(np.asarray(rl)[0,0,j]) | (int(np.asarray(rh)[0,0,j]) << 64) for j in range(N)]
    if got != model_mul(vals, d):
        ok_mul = False; print("mul mismatch d=", d)
    rl, rh = server128.monomial_div128(lo, hi, dd)
    got = [int(np.asarray(rl)[0,0,j]) | (int(np.asarray(rh)[0,0,j]) << 64) for j in range(N)]
    # div by X^d == mul by X^(2N-d)
    if got != model_mul(vals, (2*N - d) % (2*N)):
        ok_div = False; print("div mismatch d=", d)
print("monomial mul128 ok:", ok_mul, "| div128 ok:", ok_div)
