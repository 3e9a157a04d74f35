import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu import shortint
from tfhe_tpu.core import torus128
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import ntt, server128
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
bskm = jnp.asarray(torus128.bootstrap_key128_to_ntt(bsk_lo, bsk_hi, plan))
N = SP.polynomial_size

# GLWE with REAL nonzero mask: encrypt the message poly m (value 3*delta at coeff 0)
body = np.zeros(N, dtype=object)
body[0] = 3 * SP.delta128
b_lo = np.array([int(x) & ((1<<64)-1) for x in body], np.uint64)
b_hi = np.array([int(x) >> 64 for x in body], np.uint64)
g_lo, g_hi = torus128.encrypt_glwe_assign128(gsk, b_lo, b_hi, noise, gen, plan)

for bit_idx in [0, 1]:
    s_bit = int(ck.lwe_secret_key.data[bit_idx])
    p_lo, p_hi = server128.external_product128(jnp.asarray(g_lo)[None], jnp.asarray(g_hi)[None], bskm[bit_idx], plan, SP.decomp_base_log, SP.decomp_level_count)
    p_lo, p_hi = np.asarray(p_lo)[0], np.asarray(p_hi)[0]
    acc_lo, acc_hi = p_lo[-1].copy(), p_hi[-1].copy()
    for i in range(SP.glwe_dimension):
        q_lo, q_hi = ntt.negacyclic_polymul_u128(p_lo[i], p_hi[i], gsk.data[i], np.zeros(N, np.uint64), plan, np)
        acc_lo, acc_hi = ntt.sub128(acc_lo, acc_hi, q_lo, q_hi, np)
    got = int(acc_lo[0]) | (int(acc_hi[0]) << 64)
    exp = (s_bit * 3 * SP.delta128) % M
    e = (got - exp) % M
    if e >= M//2: e -= M
    print(f"bit {bit_idx} (s={s_bit}): EP(enc GLWE) err = 2^{abs(e).bit_length()} (delta=2^123)")
