"""v9 multibit fusion checks on CPU: twin semantics + kernel parity.

The axon plugin ignores JAX_PLATFORMS; force CPU via jax.config.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from tfhe_tpu.core import keygen as kg, multibit as mb
from tfhe_tpu.core.entities import LweBootstrapKey
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu as pm, server as srv
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)

N, N_IN, K, BASE_LOG, LEVELS, G = 512, 4, 1, 23, 1, 2
gen_s = SecretRandomGenerator(123)
lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
decomp = DecompParams(BASE_LOG, LEVELS)
mbk = mb.generate_multibit_bootstrap_key(
    lwe_sk, glwe_sk, decomp, G, TUniform(3), gen_e)
plan = mxu.make_mxu_plan(N, num_primes=4)

# indicator-key build (multibit_bsk_to_mxu flattens the pattern axis)
m_limbs = mxu.multibit_bsk_to_mxu(mbk, decomp, plan, G)

rng = np.random.default_rng(1)
B = 8
mask = rng.integers(0, 2 * N, (B, N_IN), dtype=np.uint64)
body = rng.integers(0, 2 * N, (B,), dtype=np.uint64)
lut = rng.integers(0, 1 << 64, (B, K + 1, N), dtype=np.uint64)
degrees = srv.multibit_switched_degrees(jnp.asarray(mask), G,
                                        N.bit_length(), raw=False)

got = np.asarray(mxu.blind_rotate_mxu_multibit(
    degrees, jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, G))

# ---- semantics: decrypt(acc) ~ X^{-b + sum a_i s_i} * decrypt(lut) --------
s = np.asarray(lwe_sk.data, dtype=np.int64)
rot = (-(body.astype(np.int64)) + (mask.astype(np.int64) * s).sum(-1)) % (2 * N)

# negacyclic rotation matrix applied via index arithmetic (vectorized)
idx = np.arange(N)


def rot_poly_batch(p, r):
    out = np.empty_like(p)
    for e in range(p.shape[0]):
        rr = int(r[e]) % (2 * N)
        src = (idx - rr) % N
        sign = ((idx - rr) // N) % 2  # odd wraps negate
        out[e] = np.where(sign == 0, p[e, src], np.uint64(0) - p[e, src])
    return out


def dec_glwe(ct):
    # phase = body - sum_j s_j (*) a_j; binary s -> sum of rotations
    out = []
    for e in range(ct.shape[0]):
        acc = ct[e, K].astype(np.uint64).copy()
        for j in range(K):
            skd = np.asarray(glwe_sk.data[j], dtype=np.uint64)
            aj = ct[e, j].astype(np.uint64)
            ones = np.nonzero(skd)[0]
            conv = np.zeros(N, dtype=np.uint64)
            for i in ones:
                src = (idx - i) % N
                sign = ((idx - i) // N) % 2
                conv += np.where(sign == 0, aj[src], np.uint64(0) - aj[src])
            acc -= conv
        out.append(acc)
    return np.stack(out)


ph_exp = rot_poly_batch(dec_glwe(lut), rot)
diff = (dec_glwe(got) - ph_exp).view(np.int64)
print("twin max |noise|: 2^%.1f" % np.log2(np.abs(diff).max() + 1))
assert np.abs(diff).max() < (1 << 48), "phase mismatch"
print("TWIN SEMANTICS OK")

got_t = np.asarray(mxu.blind_rotate_mxu_multibit(
    degrees, jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, G, trunc=True))
dt = (dec_glwe(got_t) - ph_exp).view(np.int64)
print("trunc twin max |noise|: 2^%.1f" % np.log2(np.abs(dt).max() + 1))
assert np.abs(dt).max() < (1 << 48)
print("TRUNC TWIN OK")

# ---- kernel parity (interpret mode) vs the twin ---------------------------
lut_al = (lut >> np.uint64(32)) << np.uint64(32)  # delta-aligned for trunc
bhat = mxu.multibit_eval_domain(mbk, decomp, plan, G)
v32, corr = mxu.middle_v9_from_eval_device(jnp.asarray(bhat), plan,
                                           BASE_LOG, G, ss=2)
for trunc in (True, False):
    want = np.asarray(mxu.blind_rotate_mxu_multibit(
        degrees, jnp.asarray(body), jnp.asarray(lut_al),
        jnp.asarray(m_limbs), plan, BASE_LOG, LEVELS, G, trunc=trunc))
    got_k = np.asarray(pm.blind_rotate_pallas_v9(
        degrees, jnp.asarray(body), jnp.asarray(lut_al),
        v32, corr, plan, BASE_LOG, LEVELS, G, tb=4, interpret=True,
        trunc_acc=trunc, ss=2))
    if trunc:
        want = want & np.uint64(0xFFFFFFFF00000000)
    eq = (got_k == want)
    print(f"kernel parity trunc={trunc}: {eq.mean()*100:.2f}% equal")
    assert eq.all(), np.argwhere(~eq)[:5]
print("V9 KERNEL PARITY OK")
