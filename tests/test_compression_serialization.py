"""Compression (packing keyswitch) and serialization tests."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.shortint.compression import CompressionKey, decompress
from tfhe_tpu.utils import serialization as ser


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xC0FF)


def test_compress_decompress_roundtrip(keys):
    ck, sk = keys
    comp_key = CompressionKey(ck, seed=0xC0FF)
    msgs = [0, 1, 2, 3, 3, 2, 1, 0, 2]
    cts = [ck.encrypt(m) for m in msgs]
    packed = comp_key.compress(cts)
    assert packed.glwes.shape[0] == 1  # all fit one GLWE
    outs = comp_key.decompress(packed)
    for m, o in zip(msgs, outs):
        assert ck.decrypt(o) == m


def test_decompress_glwe_boundary_indices(keys):
    """Slots at the last coefficient of one storage GLWE and the first of the
    next exercise the extraction's sign-flip edge cases (j=0, j=N_c-1)."""
    ck, sk = keys
    comp_key = CompressionKey(ck, seed=0xC0FF)
    n_c = comp_key.comp.lwe_per_glwe
    count = n_c + 3
    msgs = [i % 4 for i in range(count)]
    cts = [ck.encrypt(m) for m in msgs]
    packed = comp_key.compress(cts)
    assert packed.glwes.shape[0] == 2
    picks = [0, 1, n_c - 1, n_c, n_c + 2]
    outs = comp_key.decompress(packed, indices=picks)
    for idx, o in zip(picks, outs):
        assert ck.decrypt(o) == msgs[idx]


def test_compression_ratio(keys):
    ck, sk = keys
    comp_key = CompressionKey(ck, seed=0xC0FF)
    n = 64
    cts = [ck.encrypt(i % 4) for i in range(n)]
    packed = comp_key.compress(cts)
    raw = n * cts[0].data.nbytes
    packed_bytes = packed.glwes.nbytes
    # 64 cts of 513 u64 words -> one storage GLWE of (k_c+1)*N_c u16 words
    assert packed_bytes < raw / 100


def test_serialize_shortint_ciphertext(keys):
    ck, sk = keys
    ct = ck.encrypt(3)
    data = ser.serialize(ct)
    ct2 = ser.deserialize(data)
    assert ck.decrypt(ct2) == 3
    assert ct2.degree == ct.degree and ct2.noise_level == ct.noise_level
    assert np.array_equal(np.asarray(ct2.data), np.asarray(ct.data))


def test_serialize_radix(keys):
    from tfhe_tpu import integer

    ick = integer.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xC0FF)
    ct = ick.encrypt_radix(123, 4)
    ct2 = ser.deserialize(ser.serialize(ct))
    assert ick.decrypt_radix(ct2) == 123


def test_safe_serialize_limits(keys):
    ck, sk = keys
    ct = ck.encrypt(1)
    with pytest.raises(ValueError):
        ser.safe_serialize(ct, size_limit=100)
    data = ser.safe_serialize(ct)
    with pytest.raises(ValueError):
        ser.safe_deserialize(data, size_limit=100)
    with pytest.raises(ValueError):
        ser.safe_deserialize(data, conformance=lambda c: False)
    ok = ser.safe_deserialize(data, conformance=lambda c: c.message_modulus == 4)
    assert ck.decrypt(ok) == 1


def test_corrupted_inputs_error_not_crash(keys):
    # adversarial-input analog (tests/corrupted_inputs_deserialization.rs)
    ck, sk = keys
    data = bytearray(ser.serialize(ck.encrypt(2)))
    for cut in [0, 1, len(data) // 2]:
        try:
            ser.deserialize(bytes(data[:cut]))
        except (ValueError, IndexError, KeyError, TypeError):
            pass
    data[5] ^= 0xFF
    try:
        ser.deserialize(bytes(data))
    except (ValueError, IndexError, KeyError, TypeError):
        pass


def test_versioned_upgrade_chain():
    # register a toy type with an upgrade and check the chain runs
    class Point:
        def __init__(self, x, y):
            self.x, self.y = x, y

    ser.register_type("Point", 1,
                      lambda p: {"x": p.x, "y": p.y},
                      lambda d: Point(d["x"], d["y"]))
    # simulate a v0 payload ({"coords": [x, y]})
    ser.register_upgrade("Point", 0, lambda d: {"x": d["coords"][0], "y": d["coords"][1]})
    old = ser.cbor_dumps({"magic": ser.MAGIC, "format": 1, "type": "Point",
                          "version": 0, "payload": {"coords": [3, 4]}})
    p = ser.deserialize(old)
    assert (p.x, p.y) == (3, 4)


def test_serialize_new_types():
    """Round-trip the round-1 additions through versioned serialization."""
    from tfhe_tpu import integer
    from tfhe_tpu.utils.serialization import deserialize, serialize

    ck, _ = integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xC0FE)
    # signed radix
    s = ck.encrypt_signed_radix(-77, 4)
    s2 = deserialize(serialize(s))
    assert ck.decrypt_signed_radix(s2) == -77
    # CRT
    c = ck.encrypt_crt(7, [3, 4])
    c2 = deserialize(serialize(c))
    assert ck.decrypt_crt(c2) == 7
