"""Statistical validation of the rounded-BSK production configuration.

The TPU ServerKey default (3-prime MXU stack) rounds every BSK coefficient
to a multiple of 2^15 (ops/mxu.round_bsk) so three 28-bit CRT primes cover
the convolution bound.  VERDICT r2 flagged that this configuration shipped
without variance/pfail evidence.  This file provides it:

  1. the closed-form rounding term (core/noise.bsk_rounding_additive_variance)
     is validated where it DOMINATES: parameters tuned so ~99.9% of the PBS
     output variance comes from the rounding error (rb=24) — a factor-2
     error in the formula fails the test;
  2. measured pfail at rounded-BSK-tuned parameters matches the erfc
     prediction built from the same formulas (rb tuned so the output noise
     itself drives observable decrypt failures);
  3. the statistical chain is tied bit-exactly to the production kernel:
     srv.ks_pbs_batch_mxu(kernel="v5", interpret=True) equals the XLA MXU
     composition used for the bulk statistics;
  4. at the production 2_2 family (rb=15) the rounding term is confirmed
     ~0.6% of the PBS output variance and the 2^-128 pfail claim survives
     with margin.

Model: /root/reference/tfhe/src/shortint/server_key/tests/noise_distribution/
br_dp_ks_ms.rs:432-479 (measured pfail vs prediction at re-tuned params).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu import shortint
from tfhe_tpu.core import noise as nf
from tfhe_tpu.ops import mxu, server as srv
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.params import MsNoiseReduction, ShortintParams
from tfhe_tpu.shortint.server_key import ServerKey
from tfhe_tpu.utils.csprng import TUniform

PROD = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128


def _tuned(rb_unused: int) -> ShortintParams:
    """Small, quiet parameters: the only loud noise source is the BSK
    rounding the test injects (pre-BR noise keeps box selection reliable)."""
    return ShortintParams(
        lwe_dimension=64,
        glwe_dimension=1,
        polynomial_size=256,
        lwe_noise=TUniform(3),
        glwe_noise=TUniform(3),
        pbs_base_log=23,
        pbs_level=1,
        ks_base_log=4,
        ks_level=4,
        message_modulus=4,
        carry_modulus=4,
        max_noise_level=5,
        log2_p_fail=-3.0,
        ms_noise_reduction=MsNoiseReduction.NONE,
    )


@pytest.fixture(scope="module")
def tuned_keys():
    p = _tuned(0)
    ck = ClientKey(p, seed=0xB5C)
    sk = ServerKey(ck, seed=0xB5C)
    return p, ck, sk


def _xla_mxu_chain(p, sk, ct_rows, lut_acc, plan3, m3):
    """KS -> MS -> blind rotate (XLA MXU path, rounded BSK) -> extract.

    Bit-identical to srv.ks_pbs_batch_mxu(kernel="v5") — sealed by
    test_v5_chain_ties_to_xla below."""
    log_mod = p.polynomial_size.bit_length()
    ks = srv.keyswitch(jnp.asarray(ct_rows), sk.ksk, p.ks_base_log,
                       p.ks_level, p.bits)
    body = srv.modulus_switch(ks[:, -1], log_mod, p.bits)
    msed = srv.modulus_switch(ks[:, :-1], log_mod, p.bits)
    lut_b = jnp.asarray(np.broadcast_to(
        np.asarray(lut_acc), (ct_rows.shape[0],) + np.asarray(lut_acc).shape))
    acc = mxu.blind_rotate_mxu(msed, body, lut_b, jnp.asarray(m3), plan3,
                               p.pbs_base_log, p.pbs_level)
    return np.asarray(srv.sample_extract(acc))


def _phases(big_sk, rows, delta):
    dots = (rows[:, :-1] * big_sk[None, :]).sum(axis=1, dtype=np.uint64)
    ph = (rows[:, -1] - dots).astype(np.int64).astype(np.float64)
    return ph - np.round(ph / delta) * delta


def test_rounding_term_variance(tuned_keys):
    """rb=24: the rounding term is ~99.9% of the PBS output variance; the
    measured post-PBS phase variance must match the closed form."""
    p, ck, sk = tuned_keys
    rb = 24
    plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=rb)
    m3, _ = mxu.bsk_to_mxu(sk._bsk_coeff, plan3)

    want = nf.pbs_output_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
        nf.distribution_variance(p.glwe_noise, p.bits), p.bits,
        bsk_round_bits=rb)
    base = nf.pbs_output_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
        nf.distribution_variance(p.glwe_noise, p.bits), p.bits)
    assert want > 50 * base, "tuning drifted: rounding term must dominate"

    n_s = 256
    cts = np.stack([np.asarray(ck.encrypt(0).data) for _ in range(n_s)])
    lut = sk.generate_lookup_table(lambda x: x)
    rows = _xla_mxu_chain(p, sk, cts, lut.acc, plan3, m3)
    big_sk = ck.big_lwe_secret_key.data.astype(np.uint64)
    ph = _phases(big_sk, rows, p.delta)
    got = ph.var()
    assert 0.7 * want < got < 1.45 * want, (got, want)
    assert abs(ph.mean()) < 6 * math.sqrt(want / n_s)


def test_rounded_bsk_measured_pfail(tuned_keys):
    """rb=27: rounding noise alone drives an observable decrypt-failure rate
    that must match the erfc prediction from the closed forms."""
    p, ck, sk = tuned_keys
    rb = 27
    plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=rb)
    m3, _ = mxu.bsk_to_mxu(sk._bsk_coeff, plan3)

    var_out = nf.pbs_output_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level,
        nf.distribution_variance(p.glwe_noise, p.bits), p.bits,
        bsk_round_bits=rb)
    half_box = p.delta / 2.0
    pred = math.erfc(half_box / math.sqrt(2.0 * var_out))
    assert 0.005 < pred < 0.5, f"tuning drifted: predicted pfail {pred}"

    rng = np.random.default_rng(7)
    n_s = 512
    vals = rng.integers(0, 4, n_s)
    cts = np.stack([np.asarray(ck.encrypt(int(v)).data) for v in vals])
    lut = sk.generate_lookup_table(lambda x: x)
    rows = _xla_mxu_chain(p, sk, cts, lut.acc, plan3, m3)
    big_sk = ck.big_lwe_secret_key.data.astype(np.uint64)
    dots = (rows[:, :-1] * big_sk[None, :]).sum(axis=1, dtype=np.uint64)
    phases = (rows[:, -1] - dots).astype(np.uint64)
    dec = ((phases.astype(np.float64) / p.delta).round().astype(np.int64)
           % p.total_modulus)
    fails = int((dec != vals).sum())
    rate = fails / n_s
    sd = math.sqrt(pred * (1 - pred) / n_s)
    assert pred / 3 - 4 * sd <= rate <= 3 * pred + 4 * sd, (rate, pred)
    assert fails > 0, "tuned parameters should actually fail sometimes"


def test_v5_chain_ties_to_xla(tuned_keys):
    """The production-kernel chain (ks_pbs_batch_mxu kernel=v5, interpret
    mode) is bit-identical to the XLA composition the statistics ran on."""
    p, ck, sk = tuned_keys
    rb = 24
    plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=rb)
    bsk = sk._bsk_coeff
    m3, _ = mxu.bsk_to_mxu(bsk, plan3)
    v32, corr, _ = mxu.bsk_to_mxu_v5(bsk, plan3)

    b = 4
    cts = np.stack([np.asarray(ck.encrypt(i % 4).data) for i in range(b)])
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % 16)
    want = _xla_mxu_chain(p, sk, cts, lut.acc, plan3, m3)
    lut_b = jnp.asarray(np.broadcast_to(
        np.asarray(lut.acc), (b,) + np.asarray(lut.acc).shape))
    got = np.asarray(srv.ks_pbs_batch_mxu(
        jnp.asarray(cts), lut_b, sk.ksk, jnp.asarray(v32), plan3,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level, p.bits,
        False, 2, kernel="v5", interpret=True, corr_mid=jnp.asarray(corr)))
    assert (got == want).all()


def test_mask_floored_rounding_is_body_only(tuned_keys):
    """Single-step isolation (identical digits, no trajectory divergence):
    one external product through the floored+rounded key minus the same
    product through the floored unrounded key leaves exactly
    sum_j d (*) e_round on the BODY coordinate — variance l*(k+1)*N*
    E[d^2]*2^(2rb)/12 with NO (1+kN/2) factor.  Needs encryption noise
    louder than the rounding step so rounding doesn't just snap bodies back
    to their noise-free lattice points (see the flooring guard)."""
    import dataclasses

    p0, _, _ = tuned_keys
    p = dataclasses.replace(p0, glwe_noise=TUniform(26))
    ck = ClientKey(p, seed=0xF10)
    sk = ServerKey(ck, seed=0xF10)
    rb = 24
    plan3 = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=rb)
    plan4 = mxu.make_mxu_plan(p.polynomial_size, num_primes=4, round_bits=0)
    bsk_f = mxu.mask_floor_bsk(sk._bsk_coeff, ck.glwe_secret_key, rb)
    m3, _ = mxu.bsk_to_mxu(bsk_f, plan3)       # floored + rounded (plan rb)
    m4, _ = mxu.bsk_to_mxu(bsk_f, plan4)       # floored, NOT rounded
    rng = np.random.default_rng(3)
    b = 16
    glwe = rng.integers(0, 1 << 64, (b, p.glwe_dimension + 1,
                                     p.polynomial_size), dtype=np.uint64)
    out3 = np.asarray(mxu.external_product_mxu(
        jnp.asarray(glwe), jnp.asarray(m3[0]), plan3,
        p.pbs_base_log, p.pbs_level))
    out4 = np.asarray(mxu.external_product_mxu(
        jnp.asarray(glwe), jnp.asarray(m4[0]), plan4,
        p.pbs_base_log, p.pbs_level))
    d = out3 - out4
    # identical digits => the mask coordinates agree exactly; the body
    # difference is the pure rounding contribution
    assert (d[:, :-1, :] == 0).all()
    dph = d[:, -1, :].astype(np.int64).astype(np.float64).ravel()
    bq = 2.0 ** p.pbs_base_log
    want = (p.pbs_level * (p.glwe_dimension + 1) * p.polynomial_size
            * (bq * bq + 2.0) / 12.0 * 2.0 ** (2 * rb) / 12.0)
    got = dph.var()
    # 4096 samples; a (1+kN/2)=129x formula error fails this hard
    assert 0.8 * want < got < 1.25 * want, (got, want)


def test_production_rounding_budget():
    """At the 2_2 production family with rb=15 the rounding term is ~0.6%
    of the PBS output variance, and the 2^-128 pfail claim survives it."""
    p = PROD
    rb = 15
    var_bsk = nf.distribution_variance(p.glwe_noise, p.bits)
    base = nf.pbs_output_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level, var_bsk, p.bits)
    extra = nf.bsk_rounding_additive_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level, rb)
    extra_floored = nf.bsk_rounding_additive_variance(
        p.lwe_dimension, p.glwe_dimension, p.polynomial_size,
        p.pbs_base_log, p.pbs_level, rb, mask_floored=True)
    # the shipped ServerKey mask-floors the BSK (ops/mxu.mask_floor_bsk),
    # so the production rounding cost is the body-only term: ~0.6% of base
    assert 0.001 < extra_floored / base < 0.02, extra_floored / base
    # WITHOUT flooring the mask-error amplification makes rounding dominate
    # (the round-2 "~0.6%" claim undercounted by (1+k*N/2) = 1025x) — this
    # is why flooring exists:
    assert extra / extra_floored == 1.0 + p.glwe_dimension * p.polynomial_size / 2.0

    # worst-case atomic-pattern input: max_noise_level accumulated PBS
    # outputs (rounded BSK), then KS + MS; pfail = P[|noise| > half box]
    def pfail(with_rounding: bool) -> float:
        var_in = p.max_noise_level * (base
                                      + (extra_floored if with_rounding else 0))
        var = var_in + nf.keyswitch_additive_variance(
            p.big_lwe_dimension, p.ks_base_log, p.ks_level,
            nf.distribution_variance(p.lwe_noise, p.bits), p.bits)
        var += nf.centered_ms_additive_variance(
            p.lwe_dimension, p.polynomial_size.bit_length(), p.bits)
        half_box = 2.0 ** p.bits / (2 * p.total_modulus) / 2.0
        x = half_box / math.sqrt(2.0 * var)
        # log2 erfc(x) ~ -x^2/ln(2) - log2(x sqrt(pi)) for large x
        return -x * x / math.log(2) - math.log2(x * math.sqrt(math.pi))

    lp_r, lp_0 = pfail(True), pfail(False)
    assert lp_r < -128, lp_r             # claim holds WITH the rounding term
    assert 0 <= lp_r - lp_0 < 1, (lp_r, lp_0)   # costs < 1 bit of margin
