import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from tfhe_tpu import shortint
from tfhe_tpu.core import torus128
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import ntt
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform
from tfhe_tpu.shortint.noise_squashing import TEST_NOISE_SQUASHING_PARAM as SP

np.seterr(over="ignore")
M = 1 << 128
plan = ntt.make_plan(SP.polynomial_size, 6)
sec = SecretRandomGenerator(1)
gsk = torus128.generate_binary_glwe_secret_key128(SP.glwe_dimension, SP.polynomial_size, sec)
gen = EncryptionRandomGenerator(2, DeterministicSeeder(3))
noise = TUniform(SP.glwe_noise_bound_log2)
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
decomp = DecompParams(SP.decomp_base_log, SP.decomp_level_count)
bsk_lo, bsk_hi = torus128.generate_bootstrap_key128(ck.lwe_secret_key, gsk, decomp, noise, gen, plan)
N = SP.polynomial_size
i, j, r = 0, 0, 0
shift = 128 - decomp.base_log * (decomp.level_count - j)
lo, hi = bsk_lo[i, j, r], bsk_hi[i, j, r]
a_lo, a_hi = lo[-1].copy(), hi[-1].copy()
for t in range(SP.glwe_dimension):
    q_lo, q_hi = ntt.negacyclic_polymul_u128(lo[t], hi[t], gsk.data[t], np.zeros(N, np.uint64), plan, np)
    a_lo, a_hi = ntt.sub128(a_lo, a_hi, q_lo, q_hi, np)
dec = []
for c in range(16):
    got = int(a_lo[c]) | (int(a_hi[c]) << 64)
    # divide by -2^shift (round)
    v = (-got) % M
    q = ((v >> (shift - 1)) + 1) >> 1
    if q >= 1 << 70: q -= 1 << 72  # rough recentering
    dec.append(q)
print("decrypted/(-2^shift) first 16:", dec)
print("s_0 first 16:               ", [int(b) for b in gsk.data[0][:16]])
print("s_0 reversed-ish [0] + [-1:-16]:", [int(gsk.data[0][0])] + [int(b) for b in gsk.data[0][:-17:-1]])
