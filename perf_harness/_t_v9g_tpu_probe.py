"""v9g Mosaic lowering probe on the real chip: toy shape (N=512) compile +
decrypt-parity vs the XLA twin, then timing."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tfhe_tpu.core import keygen as kg, multibit as mb
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu as pm, server as srv
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)

N, K, BASE_LOG, LEVELS, G = 512, 1, 23, 1, 2
N_IN = int(os.environ.get("N_IN", "6"))
TB = int(os.environ.get("TB", "128"))
B = int(os.environ.get("B", "128"))
SS = int(os.environ.get("SS", "2"))

gen_s = SecretRandomGenerator(123 + N_IN)
lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
decomp = DecompParams(BASE_LOG, LEVELS)
mbk = mb.generate_multibit_bootstrap_key(
    lwe_sk, glwe_sk, decomp, G, TUniform(3), gen_e)
plan = mxu.make_mxu_plan(N, num_primes=4)
m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, G)
bhat = mxu.multibit_eval_domain(mbk, decomp, plan, G)
v32, corr = mxu.middle_v9_from_eval_device(jnp.asarray(bhat), plan,
                                           BASE_LOG, G, ss=SS,
                                           subset_major=True)
rng = np.random.default_rng(2)
mask = rng.integers(0, 2 * N, (B, N_IN), dtype=np.uint64)
body = rng.integers(0, 2 * N, (B,), dtype=np.uint64)
lut = (rng.integers(0, 1 << 32, (B, K + 1, N), dtype=np.uint64)
       << np.uint64(32))
degrees = srv.multibit_switched_degrees(jnp.asarray(mask), G,
                                        N.bit_length(), raw=False)
want = np.asarray(mxu.blind_rotate_mxu_multibit(
    degrees, jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, G, trunc=True))
f = jax.jit(lambda d, bo, l, v, c: pm.blind_rotate_pallas_v9g(
    d, bo, l, v, c, plan, BASE_LOG, LEVELS, G, tb=TB, ss=SS))
t0 = time.time()
got = np.asarray(f(degrees, jnp.asarray(body), jnp.asarray(lut), v32, corr))
print(f"toy compile+first: {time.time()-t0:.1f}s", flush=True)
eq = (got == want)
print(f"toy parity on TPU: {eq.mean()*100:.2f}% equal", flush=True)
assert eq.all(), np.argwhere(~eq)[:8]
t0 = time.time()
for _ in range(4):
    got = f(degrees, jnp.asarray(body), jnp.asarray(lut), v32, corr)
np.asarray(got)
print(f"toy steady: {(time.time()-t0)/4*1e3:.1f} ms/batch", flush=True)
print("V9G TPU PROBE OK")
