"""Isolate the fused-multibit noise terms: classic vs g=2, rb=0 vs rb=16."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from tfhe_tpu.core import keygen as kg, multibit as mb, noise as nf
from tfhe_tpu.core.entities import LweBootstrapKey
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, server as srv
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)

n_in, N, bl, l = 64, 2048, 22, 1
NOISE = TUniform(17)
gen_s = SecretRandomGenerator(31)
lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(1, N, gen_s)
decomp = DecompParams(bl, l)
n_s = 128
rng = np.random.default_rng(5)
mask = rng.integers(0, 2 * N, (n_s, n_in), dtype=np.uint64)
body = np.zeros(n_s, dtype=np.uint64)
delta = np.uint64(1 << 59)
box = np.repeat(np.arange(16, dtype=np.uint64) * delta, N // 16)
lut = np.broadcast_to(np.stack([np.zeros(N, np.uint64), box]),
                      (n_s, 2, N)).copy()
idx = np.arange(N)


def rotp(p, rr):
    src = (idx - rr) % N
    sign = ((idx - rr) // N) % 2
    return np.where(sign == 0, p[src], np.uint64(0) - p[src])


s = np.asarray(lwe_sk.data, dtype=np.int64)
rot = ((mask.astype(np.int64) * s).sum(-1)) % (2 * N)
exp_pt = np.stack([rotp(lut[e, 1], int(rot[e]))[0] for e in range(n_s)])
big_sk = np.asarray(glwe_sk.data[0]).astype(np.uint64)


def measure(acc):
    se = np.asarray(srv.sample_extract(jnp.asarray(acc)))
    phase = se[:, -1] - (se[:, :-1] * big_sk[None, :]).sum(
        axis=1, dtype=np.uint64)
    return (phase - exp_pt).view(np.int64).astype(np.float64).var()


vb = nf.distribution_variance(NOISE, 64)

# 1) classic, rb=0 (4 primes)
gen_e = EncryptionRandomGenerator(11, DeterministicSeeder(3))
bsk = kg.generate_lwe_bootstrap_key(lwe_sk, glwe_sk, decomp, NOISE, gen_e)
plan4 = mxu.make_mxu_plan(N, num_primes=4)
m_limbs, _ = mxu.bsk_to_mxu(bsk, plan4)
acc = np.asarray(mxu.blind_rotate_mxu(
    jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_limbs), plan4, bl, l))
got = measure(acc)
want = nf.pbs_output_variance(n_in, 1, N, bl, l, vb, 64)
print(f"classic rb=0: got/want = {got/want:.3f}  (want {want:.3g})")

# 2) multibit g=2, rb=0 (4 primes)
gen_e = EncryptionRandomGenerator(11, DeterministicSeeder(3))
mbk = mb.generate_multibit_bootstrap_key(lwe_sk, glwe_sk, decomp, 2, NOISE,
                                         gen_e)
m_mb = mxu.multibit_bsk_to_mxu(mbk, decomp, plan4, 2)
acc = np.asarray(mxu.blind_rotate_mxu_multibit(
    jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_mb), plan4, bl, l, 2))
got = measure(acc)
want = nf.multibit_pbs_output_variance(n_in, 2, 1, N, bl, l, vb, 64)
print(f"mb g=2 rb=0: got/want = {got/want:.3f}  (want {want:.3g})")

# 3) multibit g=2, rb=16 floored (3 primes)
flat = LweBootstrapKey(mbk.reshape((-1,) + mbk.shape[2:]), decomp, 64)
mbk_f = mxu.mask_floor_bsk(flat, glwe_sk, 16).data.reshape(mbk.shape)
plan3 = mxu.make_mxu_plan(N, num_primes=3, round_bits=16)
m_mbf = mxu.multibit_bsk_to_mxu(mbk_f, decomp, plan3, 2)
acc = np.asarray(mxu.blind_rotate_mxu_multibit(
    jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
    jnp.asarray(m_mbf), plan3, bl, l, 2))
got = measure(acc)
want = nf.multibit_pbs_output_variance(n_in, 2, 1, N, bl, l, vb, 64,
                                       bsk_round_bits=16,
                                       bsk_mask_floored=True)
print(f"mb g=2 rb=16: got/want = {got/want:.3f}  (want {want:.3g})")
