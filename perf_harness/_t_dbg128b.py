import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu import shortint
from tfhe_tpu.core import torus128
from tfhe_tpu.core.encrypt import decrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.ops import ntt, server, server128
from tfhe_tpu.shortint.noise_squashing import (TEST_NOISE_SQUASHING_PARAM,
    NoiseSquashingKey, NoiseSquashingPrivateKey)

np.seterr(over="ignore")
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
sk = shortint.ServerKey(ck, seed=0x128)
priv = NoiseSquashingPrivateKey(TEST_NOISE_SQUASHING_PARAM, seed=0x129)
nsk = NoiseSquashingKey(ck, priv, seed=0x130)
p = sk.params
msg = 2
ct = ck.encrypt(msg)

# step 1: u64 keyswitch, decrypt under small key
ks = server.keyswitch(jnp.asarray(np.asarray(ct.data))[None], sk.ksk, p.ks_base_log, p.ks_level, 64)
ksn = np.asarray(ks)[0]
pt = decrypt_lwe(ck.lwe_secret_key, LweCiphertext(ksn, 64))
print("after KS decode:", ((pt + p.delta//2)//p.delta) % 32)

# step 2: MS + BR128 manually
sp = nsk.params
N = sp.polynomial_size
log_mod = N.bit_length()
body = server.modulus_switch(ks[:, -1], log_mod, 64)
mask = server.modulus_switch(ks[:, :-1], log_mod, 64)
lut_lo, lut_hi = server128.generate_lut128(N, sp.glwe_dimension+1, 16, sp.delta128, lambda x: x)
a_lo, a_hi = server128.blind_rotate128(mask, body,
    jnp.asarray(lut_lo)[None], jnp.asarray(lut_hi)[None],
    nsk.bsk128_mont, nsk.plan128, sp.decomp_base_log, sp.decomp_level_count)
e_lo, e_hi = server128.sample_extract128(a_lo, a_hi)
pt = torus128.decrypt_lwe128(priv._key_bits, np.asarray(e_lo)[0], np.asarray(e_hi)[0])
print("manual BR128 decode:", torus128.decode128(pt, 4) % 16, "expect", msg)

sq = nsk.squash_ciphertext_noise(ct, sk)
print("full squash:", priv.decrypt_squashed_noise_ciphertext(sq))
