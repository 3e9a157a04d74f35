import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from tfhe_tpu.core import torus128
from tfhe_tpu.ops import ntt
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform

np.seterr(over="ignore")
M = 1 << 128
N, K = 512, 1
plan = ntt.make_plan(N, 6)
sec = SecretRandomGenerator(1)
gsk = torus128.generate_binary_glwe_secret_key128(K, N, sec)
gen = EncryptionRandomGenerator(2, DeterministicSeeder(3))
noise = TUniform(3)
shift = 56
factor = (-1) % M * (1 << shift) % M
f_lo, f_hi = torus128._split(factor)
bits = gsk.data[0]
body_lo = bits * f_lo
body_hi = bits * f_hi
print("factor hex:", hex(factor)[:20], "f_lo", hex(int(f_lo)), "f_hi", hex(int(f_hi))[:20])
# check body as int at a coeff where s=1
idx = int(np.nonzero(bits)[0][0])
print("body[idx] == factor:", (int(body_lo[idx]) | (int(body_hi[idx])<<64)) == factor)
lo, hi = torus128.encrypt_glwe_assign128(gsk, body_lo, body_hi, noise, gen, plan)
a_lo, a_hi = lo[-1].copy(), hi[-1].copy()
for t in range(K):
    q_lo, q_hi = ntt.negacyclic_polymul_u128(lo[t], hi[t], gsk.data[t], np.zeros(N, np.uint64), plan, np)
    a_lo, a_hi = ntt.sub128(a_lo, a_hi, q_lo, q_hi, np)
err = 0
for c in range(N):
    got = int(a_lo[c]) | (int(a_hi[c]) << 64)
    exp = (factor * int(bits[c])) % M
    e = (got - exp) % M
    if e >= M//2: e -= M
    err = max(err, abs(e).bit_length())
print("encrypt/decrypt of body poly: max err 2^%d" % err)
