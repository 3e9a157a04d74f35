"""Parity probe: collapsed single-store branch (tb=128) vs XLA twins."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu.core import keygen as kg, multibit as mb
from tfhe_tpu.core.entities import LweBootstrapKey
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, server as srv, pallas_mxu as pm
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)

N, N_IN, K, BASE_LOG, G, TB, B = 512, 4, 1, 22, 2, 128, 128
gen_s = SecretRandomGenerator(123)
lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
decomp = DecompParams(BASE_LOG, 1)
rb = 16
plan = mxu.make_mxu_plan(N, num_primes=3, round_bits=rb)

# ---------- v9 multibit ----------
mbk = mb.generate_multibit_bootstrap_key(
    lwe_sk, glwe_sk, decomp, G, TUniform(3), gen_e)
flat = LweBootstrapKey(mbk.reshape((-1,) + mbk.shape[2:]), decomp, 64)
mbk_f = mxu.mask_floor_bsk(flat, glwe_sk, rb).data.reshape(mbk.shape)
bhat = mxu.multibit_eval_domain(mbk_f, decomp, plan, G)
v32, corr = mxu.middle_v9_from_eval_device(jnp.asarray(bhat), plan,
                                           BASE_LOG, G, ss=2)
m_limbs = mxu.multibit_bsk_to_mxu(mbk_f, decomp, plan, G)

rng = np.random.default_rng(5)
mask = rng.integers(0, 2 * N, (B, N_IN), dtype=np.uint64)
body = rng.integers(0, 2 * N, (B,), dtype=np.uint64)
lut = (rng.integers(0, 1 << 5, (B, K + 1, N), dtype=np.uint64) << np.uint64(59))
degs = srv.multibit_switched_degrees(jnp.asarray(mask), G, N.bit_length(),
                                     raw=False)
want = np.asarray(mxu.blind_rotate_mxu_multibit(
    degs, jnp.asarray(body), jnp.asarray(lut), jnp.asarray(m_limbs),
    plan, BASE_LOG, 1, G, trunc=True))
got = np.asarray(pm.blind_rotate_pallas_v9(
    degs, jnp.asarray(body), jnp.asarray(lut), v32, corr, plan,
    BASE_LOG, 1, G, tb=TB, trunc_acc=True, ss=2, interpret=True))
assert np.array_equal(got, want), "v9 tb=128 mismatch"
print("v9 tb=128 collapsed-store parity OK")

# ---------- v8 classic ----------
bsk = kg.generate_lwe_bootstrap_key(lwe_sk, glwe_sk, decomp, TUniform(3), gen_e)
bsk_f = mxu.mask_floor_bsk(bsk, glwe_sk, rb)
bh8, _ = mxu.bsk_eval_domain(bsk_f, plan)
v32_8, corr_8 = mxu.middle_v8_from_eval_device(jnp.asarray(bh8), plan,
                                               BASE_LOG, ss=2)
want8 = np.asarray(mxu.blind_rotate_mxu_trunc(
    jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(mxu.bsk_to_mxu(bsk_f, plan)[0]), plan, BASE_LOG, 1))
got8 = np.asarray(pm.blind_rotate_pallas_v8(
    jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut), v32_8, corr_8,
    plan, BASE_LOG, 1, tb=TB, trunc_acc=True, ss=2, interpret=True))
assert np.array_equal(got8, want8), "v8 tb=128 mismatch"
print("v8 tb=128 collapsed-store parity OK")
