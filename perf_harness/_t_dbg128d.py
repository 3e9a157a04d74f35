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
rng = np.random.default_rng(7)

for bit_idx in [0, 1]:
    s_bit = int(ck.lwe_secret_key.data[bit_idx])
    body = [int(a) | (int(b) << 64) for a, b in zip(
        rng.integers(0, 1<<63, N, dtype=np.uint64), rng.integers(0, 1<<63, N, dtype=np.uint64))]
    g_lo = np.zeros((1, SP.glwe_dimension+1, N), dtype=np.uint64)
    g_hi = np.zeros((1, SP.glwe_dimension+1, N), dtype=np.uint64)
    g_lo[0, -1] = [v & ((1<<64)-1) for v in body]
    g_hi[0, -1] = [v >> 64 for v in body]
    p_lo, p_hi = server128.external_product128(jnp.asarray(g_lo), jnp.asarray(g_hi), bskm[bit_idx], plan, SP.decomp_base_log, SP.decomp_level_count)
    p_lo, p_hi = np.asarray(p_lo)[0], np.asarray(p_hi)[0]
    # decrypt result
    acc_lo, acc_hi = p_lo[-1].copy(), p_hi[-1].copy()
    for i in range(SP.glwe_dimension):
        q_lo, q_hi = ntt.negacyclic_polymul_u128(p_lo[i], p_hi[i], gsk.data[i], np.zeros(N, np.uint64), plan, np)
        acc_lo, acc_hi = ntt.sub128(acc_lo, acc_hi, q_lo, q_hi, np)
    # expected: s_bit * body (+ small noise/decomp error)
    errs = []
    for j in range(N):
        got = int(acc_lo[j]) | (int(acc_hi[j]) << 64)
        exp = (s_bit * body[j]) % M
        e = (got - exp) % M
        if e >= M//2: e -= M
        errs.append(abs(e))
    print(f"bit {bit_idx} (s={s_bit}): max |err| = 2^{max(errs).bit_length()}")
