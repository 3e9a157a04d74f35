import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import jax
from tfhe_tpu import shortint
from tfhe_tpu.core import torus128
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import ntt, server128
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform
from tfhe_tpu.shortint.noise_squashing import TEST_NOISE_SQUASHING_PARAM as SP

np.seterr(over="ignore")
plan = ntt.make_plan(SP.polynomial_size, 6)
sec = SecretRandomGenerator(1)
gsk = torus128.generate_binary_glwe_secret_key128(SP.glwe_dimension, SP.polynomial_size, sec)
gen = EncryptionRandomGenerator(2, DeterministicSeeder(3))
noise = TUniform(SP.glwe_noise_bound_log2)

# 1. GLWE128 roundtrip: encrypt body polynomial, decrypt
N = SP.polynomial_size
msg_poly = np.zeros(N, dtype=object)
msg_poly[0] = 5 * SP.delta128
body_lo = np.array([int(x) & ((1<<64)-1) for x in msg_poly], dtype=np.uint64)
body_hi = np.array([int(x) >> 64 for x in msg_poly], dtype=np.uint64)
lo, hi = torus128.encrypt_glwe_assign128(gsk, body_lo, body_hi, noise, gen, plan)
# decrypt: body - sum mask*sk
acc_lo, acc_hi = lo[-1], hi[-1]
for i in range(SP.glwe_dimension):
    p_lo, p_hi = ntt.negacyclic_polymul_u128(lo[i], hi[i], gsk.data[i], np.zeros(N, np.uint64), plan, np)
    acc_lo, acc_hi = ntt.sub128(acc_lo, acc_hi, p_lo, p_hi, np)
pt = int(acc_lo[0]) | (int(acc_hi[0]) << 64)
print("glwe128 roundtrip decode:", torus128.decode128(pt, 5) % 16)

# 2. BSK + external product: EP(GGSW(s_0), trivial GLWE of X^0 * delta) should give s_0 * delta-ish
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
decomp = DecompParams(SP.decomp_base_log, SP.decomp_level_count)
bsk_lo, bsk_hi = torus128.generate_bootstrap_key128(ck.lwe_secret_key, gsk, decomp, noise, gen, plan)
bskm = jnp.asarray(torus128.bootstrap_key128_to_ntt(bsk_lo, bsk_hi, plan))
print("bsk shape:", bskm.shape, "s0..3 =", [int(b) for b in ck.lwe_secret_key.data[:4]])

# trivial GLWE: (0, delta * total const poly)
g_lo = np.zeros((1, SP.glwe_dimension+1, N), dtype=np.uint64)
g_hi = np.zeros((1, SP.glwe_dimension+1, N), dtype=np.uint64)
v = 3 * SP.delta128
g_lo[0, -1, 0] = v & ((1<<64)-1)
g_hi[0, -1, 0] = v >> 64
p_lo, p_hi = server128.external_product128(jnp.asarray(g_lo), jnp.asarray(g_hi), bskm[0], plan, SP.decomp_base_log, SP.decomp_level_count)
# decrypt EP result: should be s_0 * 3 * delta
p_lo, p_hi = np.asarray(p_lo)[0], np.asarray(p_hi)[0]
acc_lo, acc_hi = p_lo[-1], p_hi[-1]
for i in range(SP.glwe_dimension):
    q_lo, q_hi = ntt.negacyclic_polymul_u128(p_lo[i], p_hi[i], gsk.data[i], np.zeros(N, np.uint64), plan, np)
    acc_lo, acc_hi = ntt.sub128(acc_lo, acc_hi, q_lo, q_hi, np)
pt = int(acc_lo[0]) | (int(acc_hi[0]) << 64)
print("EP(s0, 3*delta) decode:", torus128.decode128(pt, 5) % 16, "expect", 3*int(ck.lwe_secret_key.data[0]) % 16)

# 3. blind rotate with all-zero mask: result = LUT rotated by body only
lut_lo, lut_hi = server128.generate_lut128(N, SP.glwe_dimension+1, 16, SP.delta128, lambda x: x)
B = 1
msed_mask = jnp.zeros((B, ck.params.lwe_dimension), dtype=jnp.uint64)
for body_val, expect in [(0, 0), (2*N//32, 1)]:  # box = 2N/32... box_in_2N = 2N/16/2? just identity of value 1 region
    msed_body = jnp.full((B,), body_val, dtype=jnp.uint64)
    a_lo, a_hi = server128.blind_rotate128(msed_mask, msed_body,
        jnp.asarray(np.broadcast_to(lut_lo, (B,)+lut_lo.shape)),
        jnp.asarray(np.broadcast_to(lut_hi, (B,)+lut_hi.shape)),
        bskm, plan, SP.decomp_base_log, SP.decomp_level_count)
    e_lo, e_hi = server128.sample_extract128(a_lo, a_hi)
    e_lo, e_hi = np.asarray(e_lo)[0], np.asarray(e_hi)[0]
    pt = torus128.decrypt_lwe128(gsk.to_lwe_key_bits(), e_lo, e_hi)
    print(f"blind rotate body={body_val}: decode {torus128.decode128(pt, 5) % 16}")
