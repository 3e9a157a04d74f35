"""Every shipped production parameter set must meet the lattice-estimator
minimal-noise curves (core/security.py — the CI analog of the reference's
scripts/execute_lattice_estimator.sh + parameters_check.yml)."""

import dataclasses

import pytest

from tfhe_tpu.core import security as sec
from tfhe_tpu.shortint import params as sp
from tfhe_tpu.utils.csprng import TUniform


def _production_sets():
    """All exported production (V1_4_* + TPU_*) shortint/multibit sets."""
    out = []
    for name in dir(sp):
        if not (name.startswith("V1_4_") or name.startswith("TPU_PARAM_")):
            continue
        v = getattr(sp, name)
        if hasattr(v, "lwe_dimension") and hasattr(v, "glwe_noise"):
            out.append((name, v))
    assert len(out) >= 10, [n for n, _ in out]
    return out


@pytest.mark.parametrize("name,p", _production_sets())
def test_param_set_meets_estimator_curves(name, p):
    for which, ok, detail in sec.check_shortint_params_secure(p):
        assert ok, f"{name} [{which}]: {detail}"


def test_test_params_are_excluded():
    """TEST_* sets are documented-insecure; make sure the production walk
    doesn't accidentally pick them up (they'd fail the curves)."""
    names = [n for n, _ in _production_sets()]
    assert not any(n.startswith("TEST_") for n in names)
    # and indeed the fast test set is insecure by these curves:
    checks = sec.check_shortint_params_secure(sp.TEST_PARAM_MESSAGE_2_CARRY_2)
    assert not all(ok for _, ok, _ in checks)


def test_glwe_noise_is_exactly_minimal_at_2_2():
    """The v1_4 2_2 GLWE noise (TUniform(17) at k*N=2048, q=2^64) sits
    exactly at the estimator minimum — a strong cross-check that our curve
    constants match the reference's recorded fits."""
    p = sp.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    need = sec.minimal_lwe_bound_tuniform(
        p.glwe_dimension * p.polynomial_size, 2.0 ** 64)
    assert p.glwe_noise.bound_log2 == need == 17


def test_mask_floored_bsk_remains_secure():
    """The production MXU BSK floors GGSW masks to multiples of 2^15
    (ops/mxu.mask_floor_bsk) — i.e. GLWE over effective modulus 2^49 with
    the same absolute noise.  That instance must still meet the curves
    (it does: same relative noise growth on both sides of the inequality)."""
    p = sp.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    ok, detail = sec.check_lwe_noise_secure(
        p.glwe_noise, p.glwe_dimension * p.polynomial_size, p.bits,
        modulus_log2_shrink=15)
    assert ok, detail


def test_boolean_params_secure():
    from tfhe_tpu.boolean import params as bp

    for name in ("DEFAULT_PARAMETERS", "DEFAULT_PARAMETERS_KS_PBS",
                 "PARAMETERS_ERROR_PROB_2_POW_MINUS_165"):
        p = getattr(bp, name, None)
        if p is None:
            continue
        for which, ok, detail in sec.check_shortint_params_secure(p):
            assert ok, f"boolean {name} [{which}]: {detail}"


def test_insecure_set_is_rejected():
    """The gate actually gates: shrinking the 2_2 noise by one bit fails."""
    p = sp.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    bad = dataclasses.replace(p, glwe_noise=TUniform(16))
    checks = sec.check_shortint_params_secure(bad)
    assert not all(ok for _, ok, _ in checks)


def test_classic_public_key_zero_encryption_count():
    """The classic LwePublicKey defaults to the LHL-safe
    n*ceil(log2 q) + 128 zero-encryption count
    (lwe_public_key_generation.rs + the parameter sets' 
    lwe_public_key_zero_encryption_count), and subset-sum encryption
    decrypts correctly."""
    import tfhe_tpu as t
    from tfhe_tpu import shortint
    from tfhe_tpu.hlapi import PublicKey

    cfg = t.ConfigBuilder().use_custom_parameters(
        shortint.TEST_PARAM_MESSAGE_2_CARRY_2).build()
    ck, _sk = t.generate_keys(cfg)
    pk = PublicKey(ck)
    p = ck.integer_key.key.params
    n = ck.integer_key.key.encryption_key.dimension
    assert pk.zero_count == n * p.bits + 128
    assert pk._zeros.shape == (pk.zero_count, n + 1)
    for m in (0, 1, 3):
        blk = pk.encrypt_block(m)
        assert ck.integer_key.key.decrypt(blk) == m
