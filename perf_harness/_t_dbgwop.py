import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu import shortint
from tfhe_tpu.core.encrypt import decrypt_glwe
from tfhe_tpu.core.entities import GlweCiphertext
from tfhe_tpu.shortint.wopbs import TEST_WOPBS_PARAM, WopbsKey
from tfhe_tpu.ops import ntt, server as srv

np.seterr(over="ignore")
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x30B)
sk = shortint.ServerKey(ck, seed=0x30C)
wk = WopbsKey(ck, sk, TEST_WOPBS_PARAM, seed=0x30D)
p = ck.params
M = 1 << 64

# 1. PFPKS of a TRIVIAL LWE encrypting x = 2^50
x = 1 << 50
lwe = np.zeros(p.big_lwe_dimension + 1, dtype=np.uint64)
lwe[-1] = x
for r in range(wk.k + 1):
    glwe = np.asarray(wk._pfpks(lwe, r))
    dec = decrypt_glwe(ck.glwe_secret_key, GlweCiphertext(glwe, 64))
    # expected p_r(X)*x
    if r < wk.k:
        exp = (-(ck.glwe_secret_key.data[r].astype(np.int64)) * x).astype(np.uint64)
    else:
        exp = np.zeros(p.polynomial_size, dtype=np.uint64); exp[0] = x
    err = (dec - exp).astype(np.int64)
    print(f"pfpks row {r}: max |err| = 2^{int(np.abs(err).max()).bit_length()}")

# 2. circuit bootstrap of an encrypted bit, then EP identity test
for bit in [0, 1]:
    ct = ck.encrypt_without_padding_value(bit)
    ggsw = wk.circuit_bootstrap_bit(ct)
    # EP(ggsw, trivial GLWE of delta) should give ~bit*delta
    g = np.zeros((1, p.glwe_dimension + 1, p.polynomial_size), dtype=np.uint64)
    g[0, -1, 0] = p.delta
    prod = np.asarray(srv.external_product_ntt(jnp.asarray(g), ggsw, wk.plan,
                                               TEST_WOPBS_PARAM.cbs_base_log,
                                               TEST_WOPBS_PARAM.cbs_level))[0]
    dec = decrypt_glwe(ck.glwe_secret_key, GlweCiphertext(prod, 64))
    got = (int(dec[0]) + (1 << 58)) >> 59
    print(f"CBS bit={bit}: EP(ggsw, delta) decodes to {got % 32} expect {bit}")
