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
i = 0  # s=1
print("s_0 =", int(ck.lwe_secret_key.data[i]))
for j in range(decomp.level_count):
    level = decomp.level_count - j
    shift = 128 - decomp.base_log * level
    for r in range(SP.glwe_dimension + 1):
        lo, hi = bsk_lo[i, j, r], bsk_hi[i, j, r]
        acc_lo, acc_hi = lo[-0:][0:0], None  # placeholder
        a_lo, a_hi = lo[-1].copy(), hi[-1].copy()
        for t in range(SP.glwe_dimension):
            q_lo, q_hi = ntt.negacyclic_polymul_u128(lo[t], hi[t], gsk.data[t], np.zeros(N, np.uint64), plan, np)
            a_lo, a_hi = ntt.sub128(a_lo, a_hi, q_lo, q_hi, np)
        # expected plaintext poly: r<k: -1*2^shift*s_r(X); r=k: +2^shift
        errbits = 0
        for c in range(N):
            got = int(a_lo[c]) | (int(a_hi[c]) << 64)
            if r < SP.glwe_dimension:
                exp = (-(1 << shift) * int(gsk.data[r][c])) % M
            else:
                exp = (1 << shift) % M if c == 0 else 0
            e = (got - exp) % M
            if e >= M // 2: e -= M
            errbits = max(errbits, abs(e).bit_length())
        print(f"level {level} row {r}: max err 2^{errbits} (shift={shift})")
