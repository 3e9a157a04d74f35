import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu.core import keygen as kg, multibit as mb
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu as pm, server as srv
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)
N, K, BASE_LOG, LEVELS, G = 512, 1, 23, 1, 2
for n_in, ss in ((8, 4), (6, 4), (8, 2)):
    gen_s = SecretRandomGenerator(123 + n_in)
    lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    decomp = DecompParams(BASE_LOG, LEVELS)
    mbk = mb.generate_multibit_bootstrap_key(lwe_sk, glwe_sk, decomp, G, TUniform(3), gen_e)
    plan = mxu.make_mxu_plan(N, num_primes=4)
    m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, G)
    bhat = mxu.multibit_eval_domain(mbk, decomp, plan, G)
    v32, corr = mxu.middle_v9_from_eval_device(jnp.asarray(bhat), plan, BASE_LOG, G,
                                               ss=ss, subset_major="t_lanes")
    rng = np.random.default_rng(2)
    b = 4
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = (rng.integers(0, 1 << 32, (b, K + 1, N), dtype=np.uint64) << np.uint64(32))
    degrees = srv.multibit_switched_degrees(jnp.asarray(mask), G, N.bit_length(), raw=False)
    want = np.asarray(mxu.blind_rotate_mxu_multibit(degrees, jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, G, trunc=True))
    got = np.asarray(pm.blind_rotate_pallas_v9g(degrees, jnp.asarray(body), jnp.asarray(lut),
        v32, corr, plan, BASE_LOG, LEVELS, G, tb=4, interpret=True, ss=ss, t_lanes=True))
    eq = (got == want)
    print(f"t_lanes n_in={n_in} ss={ss}: {eq.mean()*100:.2f}% equal", flush=True)
    assert eq.all(), np.argwhere(~eq)[:5]
print("T_LANES PARITY OK")
