"""Isolate the rounded-BSK error contribution: run the same blind rotate
with the rounded (3-prime rb) key and the unrounded (4-prime) key on
identical inputs; the difference is the pure rounding-error term."""
import sys

sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

from tfhe_tpu.ops import mxu, server as srv
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.shortint.params import MsNoiseReduction, ShortintParams
from tfhe_tpu.utils.csprng import TUniform
from tfhe_tpu.core import noise as nf

p = ShortintParams(
    lwe_dimension=64, glwe_dimension=1, polynomial_size=256,
    lwe_noise=TUniform(3), glwe_noise=TUniform(3),
    pbs_base_log=23, pbs_level=1, ks_base_log=4, ks_level=4,
    message_modulus=4, carry_modulus=4, max_noise_level=5,
    log2_p_fail=-3.0, ms_noise_reduction=MsNoiseReduction.NONE)
ck = ClientKey(p, seed=0xB5C)
sk = ServerKey(ck, seed=0xB5C)
rb = 24
plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=rb)
plan4 = mxu.make_mxu_plan(p.polynomial_size, num_primes=4, round_bits=0)
m3, _ = mxu.bsk_to_mxu(sk._bsk_coeff, plan3)
m4, _ = mxu.bsk_to_mxu(sk._bsk_coeff, plan4)

n_s = 128
cts = np.stack([np.asarray(ck.encrypt(0).data) for _ in range(n_s)])
lut = sk.generate_lookup_table(lambda x: x)
log_mod = p.polynomial_size.bit_length()
ks = srv.keyswitch(jnp.asarray(cts), sk.ksk, p.ks_base_log, p.ks_level, p.bits)
body = srv.modulus_switch(ks[:, -1], log_mod, p.bits)
msed = srv.modulus_switch(ks[:, :-1], log_mod, p.bits)
lut_b = jnp.asarray(np.broadcast_to(np.asarray(lut.acc),
                                    (n_s,) + np.asarray(lut.acc).shape))
acc3 = mxu.blind_rotate_mxu(msed, body, lut_b, jnp.asarray(m3), plan3,
                            p.pbs_base_log, p.pbs_level)
acc4 = mxu.blind_rotate_mxu(msed, body, lut_b, jnp.asarray(m4), plan4,
                            p.pbs_base_log, p.pbs_level)
r3 = np.asarray(srv.sample_extract(acc3))
r4 = np.asarray(srv.sample_extract(acc4))
diff = (r3[:, -1].astype(np.int64) - r4[:, -1].astype(np.int64)).astype(np.float64)
# mask difference contributes to phases too; compute phase difference
big_sk = ck.big_lwe_secret_key.data.astype(np.uint64)


def phase(rows):
    dots = (rows[:, :-1] * big_sk[None, :]).sum(axis=1, dtype=np.uint64)
    return (rows[:, -1] - dots).astype(np.int64).astype(np.float64)


dph = (phase(r3) - phase(r4))
print("phase-diff var:", dph.var(), "log2:", np.log2(dph.var()))
print("phase-diff mean:", dph.mean(), "log2|mean|:", np.log2(abs(dph.mean()) + 1))
want = nf.bsk_rounding_additive_variance(
    p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
    p.pbs_base_log, p.pbs_level, rb)
print("predicted rounding var:", want, "log2:", np.log2(want))
print("ratio:", dph.var() / want)
# per-sample detail: is it a mean shift or spread?
print("dph[:8]:", dph[:8])

# ---- mask-floored key: rounding error should be body-only (no kN/2 amp) ----
bsk_f = mxu.mask_floor_bsk(sk._bsk_coeff, ck.glwe_secret_key, rb)
# sanity: phases preserved exactly => same blind rotate result as plan4 path
m4f, _ = mxu.bsk_to_mxu(bsk_f, plan4)
acc4f = mxu.blind_rotate_mxu(msed, body, lut_b, jnp.asarray(m4f), plan4,
                             p.pbs_base_log, p.pbs_level)
r4f = np.asarray(srv.sample_extract(acc4f))
dph_f0 = phase(r4f) - phase(r4)
print("floored-key (unrounded) phase shift max:", np.abs(dph_f0).max())
m3f, _ = mxu.bsk_to_mxu(bsk_f, plan3)
acc3f = mxu.blind_rotate_mxu(msed, body, lut_b, jnp.asarray(m3f), plan3,
                             p.pbs_base_log, p.pbs_level)
r3f = np.asarray(srv.sample_extract(acc3f))
dph_f = phase(r3f) - phase(r4f)
want_f = nf.bsk_rounding_additive_variance(
    p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
    p.pbs_base_log, p.pbs_level, rb, mask_floored=True)
print("floored rounding var:", dph_f.var(), "log2:", np.log2(dph_f.var() + 1))
print("predicted body-only:", want_f, "log2:", np.log2(want_f))
print("ratio:", dph_f.var() / want_f)
