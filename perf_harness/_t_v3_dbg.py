"""v3 kernel debugging: piecewise parity in interpret mode (CPU).

Run: JAX_PLATFORMS=cpu python perf_harness/_t_v3_dbg.py
"""

import sys

sys.path.insert(0, ".")
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, ntt, pallas_mxu, server as srv
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
bsk_mont, plan_ref = kg.bootstrap_key_to_ntt(bsk)
m_limbs, plan_mxu = mxu.bsk_to_mxu(bsk)

rng = np.random.default_rng(5)
b = 4

# 1. layout round trip
x = rng.integers(0, 2**32, (b, K_GLWE + 1, N), dtype=np.uint32)
rt = np.asarray(pallas_mxu.from_v3_layout(
    pallas_mxu.to_v3_layout(jnp.asarray(x), K_GLWE + 1, N), b, K_GLWE + 1, N))
print("layout roundtrip:", (rt == x).all())

def run_v3(mask, body, lut):
    return np.asarray(pallas_mxu.blind_rotate_pallas_v3(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan_mxu, BASE_LOG, LEVELS, tb=2,
        interpret=True))

def run_ref(mask, body, lut):
    return np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan_ref, BASE_LOG, LEVELS))

lut = rng.integers(0, 1 << 64, (b, K_GLWE + 1, N), dtype=np.uint64)
body = np.zeros(b, dtype=np.uint64)

# 2. all-zero mask: rotation identity, ct1 = 0 -> acc unchanged
mask0 = np.zeros((b, N_IN), dtype=np.uint64)
got = run_v3(mask0, body, lut)
want = run_ref(mask0, body, lut)
print("zero-mask (no-op):", (got == want).all())

# 3. mask = multiples of N2 only (pure lane rolls, no borrow)
n2 = N // 128
mask_l = (rng.integers(0, 2 * N // n2, (b, N_IN), dtype=np.uint64) * n2)
got = run_v3(mask_l, body, lut)
want = run_ref(mask_l, body, lut)
print("lane-only rotation:", (got == want).all())

# 4. mask = small a2 only (sub-lane roll + borrow)
mask_s = rng.integers(0, n2, (b, N_IN), dtype=np.uint64)
got = run_v3(mask_s, body, lut)
want = run_ref(mask_s, body, lut)
print("i2-only rotation:", (got == want).all())

# 5. general mask
mask_g = rng.integers(0, 2 * N, (b, N_IN), dtype=np.uint64)
got = run_v3(mask_g, body, lut)
want = run_ref(mask_g, body, lut)
print("general:", (got == want).all())

# 6. body rotation only (acc0 path, outside the kernel)
body_r = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
got = run_v3(mask0, body_r, lut)
want = run_ref(mask0, body_r, lut)
print("body-only:", (got == want).all())
