"""Casting KeySwitchingKey + seeded/compressed keys and ciphertexts."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.shortint.compressed_key import CompressedCiphertext, CompressedServerKey
from tfhe_tpu.shortint.key_switching_key import KeySwitchingKey
from tfhe_tpu.shortint.params import ShortintParams, TEST_PARAM_MESSAGE_2_CARRY_2
from tfhe_tpu.utils.csprng import TUniform


@pytest.fixture(scope="module")
def cks():
    ck = shortint.ClientKey(TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xCA)
    # a second, different parameter set with the same msg/carry (smaller lwe)
    import dataclasses

    other = dataclasses.replace(TEST_PARAM_MESSAGE_2_CARRY_2, lwe_dimension=24,
                                polynomial_size=256)
    ck2 = shortint.ClientKey(other, seed=0xCB)
    return ck, ck2


def test_cast_between_param_sets(cks):
    ck, ck2 = cks
    ksk = KeySwitchingKey(ck2, ck, seed=0xCC)
    for m in range(4):
        src = ck2.encrypt(m)
        dst = ksk.cast(src)
        assert ck.decrypt(dst) == m, m


def test_cast_rejects_mismatched_moduli(cks):
    import dataclasses

    ck, _ = cks
    bad = dataclasses.replace(TEST_PARAM_MESSAGE_2_CARRY_2, message_modulus=2)
    ck3 = shortint.ClientKey(bad, seed=1)
    with pytest.raises(ValueError):
        KeySwitchingKey(ck3, ck)


def test_compressed_server_key(cks):
    ck, _ = cks
    csk = CompressedServerKey(ck, seed=0xCD)
    sk = csk.decompress()
    lut = sk.generate_lookup_table(lambda x: (x * 3) % 16)
    ct = ck.encrypt(2)
    out = sk.apply_lookup_table(ct, lut)
    assert ck.decrypt_raw(out) == 6
    # compression ratio: bodies only
    full_bsk_elems = np.prod((ck.params.lwe_dimension, ck.params.pbs_level,
                              ck.params.glwe_dimension + 1,
                              ck.params.glwe_dimension + 1,
                              ck.params.polynomial_size))
    assert csk.seeded_bsk.bodies.size * (ck.params.glwe_dimension + 1) == full_bsk_elems


def test_compressed_ciphertext(cks):
    ck, _ = cks
    for m in range(4):
        cct = CompressedCiphertext(ck, m, seed=0xD0 + m)
        assert ck.decrypt(cct.decompress()) == m
        assert cct.inner.bodies.size == 1


def test_seeded_mask_determinism(cks):
    """Two decompressions of the same seeded entity are identical."""
    ck, _ = cks
    cct = CompressedCiphertext(ck, 3, seed=0xE0)
    a = cct.decompress()
    b = cct.decompress()
    assert np.array_equal(np.asarray(a.data), np.asarray(b.data))


def test_hlapi_compressed_server_key():
    import tfhe_tpu as t

    cfg = t.ConfigBuilder().use_custom_parameters(TEST_PARAM_MESSAGE_2_CARRY_2).build()
    ck = t.ClientKey(cfg, seed=0xF0)
    csk = t.CompressedServerKey(ck, seed=0xF1)
    sk = csk.decompress()
    t.set_server_key(sk)
    a = t.FheUint8.encrypt(44, ck)
    b = t.FheUint8.encrypt(199, ck)
    assert (a + b).decrypt(ck) == 243


def test_compressed_server_key_is_mask_floored():
    """CompressedServerKey at MXU-family params decompresses to a
    mask-floored BSK (so the fast 3-prime rounded plan stays sound) that
    still evaluates correctly."""
    import numpy as np

    from tfhe_tpu import shortint
    from tfhe_tpu.shortint.client_key import ClientKey
    from tfhe_tpu.shortint.compressed_key import CompressedServerKey
    from tfhe_tpu.utils.keycache import get_shortint_keys

    P = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    ck, _ = get_shortint_keys(P)
    csk = CompressedServerKey(ck, seed=0xC5)
    assert csk.seeded_bsk.mask_floor_rb == 15
    sk = csk.decompress()
    assert sk._bsk_floored == 15
    data = np.asarray(sk._bsk_coeff.data)
    masks = data[..., :P.glwe_dimension, :]
    assert (masks & np.uint64((1 << 15) - 1) == 0).all()
    # and it still bootstraps correctly
    ct = ck.encrypt(2)
    lut = sk.generate_lookup_table(lambda x: (x + 5) % 16)
    out = sk.apply_lookup_table_batch([ct], lut)[0]
    assert ck.decrypt_raw(out) == 7
