"""Bisect the v4 redc-mode mismatch: compare v3 vs v4 per ablate stage."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, server as srv, pallas_mxu
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
    TUniform)

N, N_IN, K_GLWE, BASE_LOG, LEVELS = 512, 4, 1, 23, 1
gen_s = SecretRandomGenerator(123)
lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(K_GLWE, N, gen_s)
gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
bsk = kg.generate_lwe_bootstrap_key(
    lwe_sk, glwe_sk, DecompParams(BASE_LOG, LEVELS), TUniform(3), gen_e)
m_limbs, plan = mxu.bsk_to_mxu(bsk)
mt = jnp.asarray(mxu.transpose_middle(m_limbs))
ml = jnp.asarray(m_limbs)

rng = np.random.default_rng(5)
b = 4
mask = jnp.asarray(rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64))
body = jnp.asarray(rng.integers(0, 2 * N, (b,), dtype=np.uint64))
lut = jnp.asarray(rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64))

for ab in (None, "rot", "s1", "mid", "inv", "fold", "garner"):
    try:
        a3 = np.asarray(pallas_mxu.blind_rotate_pallas_v3(
            mask, body, lut, ml, plan, BASE_LOG, LEVELS, tb=2,
            interpret=True, ablate=ab, fold_mode="redc"))
        a4 = np.asarray(pallas_mxu.blind_rotate_pallas_v4(
            mask, body, lut, mt, plan, BASE_LOG, LEVELS, tb=2,
            interpret=True, ablate=ab, fold_mode="redc"))
        print(f"ablate={ab}: match={np.array_equal(a3, a4)}")
    except Exception as e:
        print(f"ablate={ab}: ERROR {type(e).__name__}: {e}")
