import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu import shortint
from tfhe_tpu.core import torus128
from tfhe_tpu.ops import ntt, server128
from tfhe_tpu.shortint.noise_squashing import (TEST_NOISE_SQUASHING_PARAM,
    NoiseSquashingKey, NoiseSquashingPrivateKey)

np.seterr(over="ignore")
M = 1 << 128
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
sk = shortint.ServerKey(ck, seed=0x128)
priv = NoiseSquashingPrivateKey(TEST_NOISE_SQUASHING_PARAM, seed=0x129)
nsk = NoiseSquashingKey(ck, priv, seed=0x130)
sp = nsk.params
N = sp.polynomial_size
gsk = priv.glwe_secret_key

lut_lo, lut_hi = server128.generate_lut128(N, sp.glwe_dimension+1, 16, sp.delta128, lambda x: x)
n_small = ck.params.lwe_dimension
key_bits = [int(b) for b in ck.lwe_secret_key.data]
print("key bits:", key_bits)

# single nonzero mask element a at position 0, body b
a_val, b_val = 37, 100
mask = np.zeros((1, n_small), dtype=np.uint64); mask[0, 0] = a_val
body = np.full((1,), b_val, dtype=np.uint64)
a_lo, a_hi = server128.blind_rotate128(jnp.asarray(mask), jnp.asarray(body),
    jnp.asarray(lut_lo)[None], jnp.asarray(lut_hi)[None],
    nsk.bsk128_mont, nsk.plan128, sp.decomp_base_log, sp.decomp_level_count)
a_lo, a_hi = np.asarray(a_lo)[0], np.asarray(a_hi)[0]
# decrypt whole GLWE
acc_lo, acc_hi = a_lo[-1].copy(), a_hi[-1].copy()
for i in range(sp.glwe_dimension):
    q_lo, q_hi = ntt.negacyclic_polymul_u128(a_lo[i], a_hi[i], gsk.data[i], np.zeros(N, np.uint64), nsk.plan128, np)
    acc_lo, acc_hi = ntt.sub128(acc_lo, acc_hi, q_lo, q_hi, np)
got = [int(l) | (int(h) << 64) for l, h in zip(acc_lo, acc_hi)]

# model: lut * X^(a*s0 - b) negacyclic
rot = (a_val * key_bits[0] - b_val) % (2 * N)
lut_int = [int(l) | (int(h) << 64) for l, h in zip(lut_lo[-1], lut_hi[-1])]
exp = [0]*N
for j in range(N):
    k = j + rot
    sign = 1
    while k >= N:
        k -= N; sign = -sign
    exp[k] = (sign * lut_int[j]) % M
errs = []
for j in range(N):
    e = (got[j] - exp[j]) % M
    if e >= M//2: e -= M
    errs.append(abs(e))
print(f"single-step BR: max |err| = 2^{max(errs).bit_length()} (delta=2^123)")
