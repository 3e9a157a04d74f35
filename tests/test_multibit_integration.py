"""Multi-bit PBS productization: MultiBitPBSParameters + the MultiBit
ServerKey arm end-to-end (shortint LUT apply, integer ops, hlapi)."""

import numpy as np
import pytest

import tfhe_tpu as t
from tfhe_tpu import integer, shortint
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey

MB = shortint.TEST_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey(MB, seed=0x3B)
    sk = ServerKey(ck, seed=0x3B)
    return ck, sk


def test_multibit_lut_apply(keys):
    ck, sk = keys
    assert sk.mb_bsk_mont is not None and sk.bsk_mont is None
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
    for v in range(4):
        out = sk.apply_lookup_table(ck.encrypt(v), lut)
        assert ck.decrypt_raw(out) == (v * 3 + 1) % 16


def test_multibit_many_lut(keys):
    ck, sk = keys
    mlut = sk.generate_many_lookup_table([lambda x: x % 4, lambda x: (x + 1) % 4])
    outs = sk.apply_many_lookup_table(ck.encrypt(2), mlut)
    assert ck.decrypt_raw(outs[0]) == 2
    assert ck.decrypt_raw(outs[1]) == 3


def test_multibit_modulus_switched_compression(keys):
    ck, sk = keys
    compressed = sk.switch_modulus_and_compress(ck.encrypt(3))
    lut = sk.generate_lookup_table(lambda x: x % 4)
    out = sk.decompress_and_apply_lookup_table(compressed, lut)
    assert ck.decrypt_raw(out) == 3


def test_multibit_integer_ops():
    ck, sk = integer.gen_keys(MB, seed=0x4C)
    a = ck.encrypt_radix(13, 4)
    b = ck.encrypt_radix(7, 4)
    assert ck.decrypt_radix(sk.add_parallelized(a, b)) == 20
    assert ck.decrypt_radix(sk.mul_parallelized(a, b)) == 91


def test_multibit_hlapi():
    cfg = t.ConfigBuilder().use_custom_parameters(MB).build()
    ck, sk = t.generate_keys(cfg, seed=0x5D)
    t.set_server_key(sk)
    a = t.FheUint8.encrypt(200, ck)
    b = t.FheUint8.encrypt(55, ck)
    assert (a + b).decrypt(ck) == 255
    assert (a > b).decrypt(ck) is True


def test_multibit_param_registry():
    g2 = shortint.V1_4_PARAM_GPU_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    g3 = shortint.V1_4_PARAM_GPU_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    g4 = shortint.V1_4_PARAM_GPU_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    assert (g2.grouping_factor, g3.grouping_factor, g4.grouping_factor) == (2, 3, 4)
    for p in (g2, g3, g4):
        assert p.lwe_dimension % p.grouping_factor == 0
        assert p.message_modulus == p.carry_modulus == 4
