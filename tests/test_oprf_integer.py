"""Integer + hlapi OPRF with the dedicated key (integer/oprf.rs,
shortint/oprf.rs OprfPrivateKey/OprfServerKey)."""

import numpy as np
import pytest

import tfhe_tpu as t
from tfhe_tpu import integer, shortint
from tfhe_tpu.integer.oprf import OprfPrivateKey, OprfServerKey

PARAMS = shortint.TEST_PARAM_MESSAGE_2_CARRY_2


@pytest.fixture(scope="module")
def keys():
    ck, sk = integer.gen_keys(PARAMS, seed=0x0F4F)
    return ck, sk


def test_unsigned_full(keys):
    ck, sk = keys
    pk = OprfPrivateKey(ck, seed=1)
    ok = OprfServerKey.new(pk, ck, seed=2)
    out = ok.generate_oblivious_pseudo_random_unsigned_integer(7, 4, sk)
    v = ck.decrypt_radix(out)
    assert 0 <= v < 2 ** 8
    # determinism
    out2 = ok.generate_oblivious_pseudo_random_unsigned_integer(7, 4, sk)
    assert ck.decrypt_radix(out2) == v
    # different seeds give different values with overwhelming probability
    vals = {ck.decrypt_radix(
        ok.generate_oblivious_pseudo_random_unsigned_integer(s, 4, sk))
        for s in range(5)}
    assert len(vals) > 1


def test_unsigned_bounded(keys):
    ck, sk = keys
    ok = OprfServerKey.from_compute_key(sk)
    for seed in range(4):
        out = ok.generate_oblivious_pseudo_random_unsigned_integer_bounded(
            seed, 3, 4, sk)
        assert 0 <= ck.decrypt_radix(out) < 8


def test_signed(keys):
    ck, sk = keys
    ok = OprfServerKey.from_compute_key(sk)
    out = ok.generate_oblivious_pseudo_random_signed_integer(3, 3, sk)
    v = ck.decrypt_signed_radix(out)
    assert -(2 ** 5) <= v < 2 ** 5


def test_custom_range(keys):
    ck, sk = keys
    ok = OprfServerKey.from_compute_key(sk)
    for seed in range(4):
        out = ok.generate_oblivious_pseudo_random_unsigned_custom_range(
            seed, 4, 5, 4, sk)
        assert 0 <= ck.decrypt_radix(out) < 5


def test_hlapi_oprf(keys):
    ck, sk = keys
    cfg = t.ConfigBuilder().use_custom_parameters(PARAMS).build()
    hck, hsk = t.generate_keys(cfg, seed=0x99)
    t.set_server_key(hsk)
    a = t.FheUint8.generate_oblivious_pseudo_random(5)
    assert 0 <= a.decrypt(hck) < 256
    b = t.FheUint8.generate_oblivious_pseudo_random_bounded(5, 3)
    assert 0 <= b.decrypt(hck) < 8
