"""XofKeySet, Tag, arrays, integer-level casting."""

import pytest

import tfhe_tpu as t
from tfhe_tpu import shortint
from tfhe_tpu.hlapi import CompressedXofKeySet, FheUintArray, Tag


@pytest.fixture(scope="module")
def keyset():
    cfg = t.ConfigBuilder().use_custom_parameters(shortint.TEST_PARAM_MESSAGE_2_CARRY_2).build()
    ks = CompressedXofKeySet(cfg, master_seed=0xBEEF).expand()
    t.set_server_key(ks.server_key)
    return ks


def test_xof_keyset_deterministic(keyset):
    cfg = keyset.client_key.config
    ks2 = CompressedXofKeySet(cfg, master_seed=0xBEEF).expand()
    a = t.FheUint8.encrypt(7, keyset.client_key)
    # the re-derived client key decrypts ciphertexts of the first expansion
    assert a.decrypt(ks2.client_key) == 7


def test_xof_keyset_compute(keyset):
    a = t.FheUint8.encrypt(100, keyset.client_key)
    b = t.FheUint8.encrypt(55, keyset.client_key)
    assert (a + b).decrypt(keyset.client_key) == 155


def test_tag():
    tag = Tag.from_u64(42)
    assert tag.as_u64() == 42
    assert Tag(b"x") != Tag(b"y")
    assert not Tag()


def test_array_ops(keyset):
    ck = keyset.client_key
    a = FheUintArray.encrypt([[1, 2], [3, 250]], t.FheUint8, ck)
    b = FheUintArray.encrypt([[10, 20], [30, 40]], t.FheUint8, ck)
    s = a + b
    assert (s.decrypt(ck) == [[11, 22], [33, (250 + 40) % 256]]).all()
    assert (a & b).decrypt(ck)[0][1] == 2 & 20
    tot = a.sum()
    assert tot.decrypt(ck) == (1 + 2 + 3 + 250) % 256
    assert a[1, 0].decrypt(ck) == 3


def test_integer_casting_radix(keyset):
    import dataclasses

    from tfhe_tpu import integer
    from tfhe_tpu.integer.key_switching_key import KeySwitchingKey

    other = dataclasses.replace(shortint.TEST_PARAM_MESSAGE_2_CARRY_2,
                                lwe_dimension=24, polynomial_size=256)
    ck2 = integer.ClientKey(other, seed=0xAA)
    ksk = KeySwitchingKey(ck2.key, keyset.client_key.integer_key.key, seed=0xAB)
    src = ck2.encrypt_radix(201, 4)
    dst = ksk.cast(src)
    assert keyset.client_key.integer_key.decrypt_radix(dst) == 201


def test_fhe_ascii_string(keyset):
    from tfhe_tpu.hlapi import FheAsciiString

    ck = keyset.client_key
    s = FheAsciiString.encrypt("Hi TPU", ck)
    assert s.decrypt(ck) == "Hi TPU"
    assert s.contains("TPU").decrypt(ck) is True
    assert s.eq("Hi TPU").decrypt(ck) is True
    assert s.ne("Hi GPU").decrypt(ck) is True
    assert s.to_lowercase().decrypt(ck) == "hi tpu"
    found, idx = s.find("TPU")
    assert found.decrypt(ck) is True and idx.decrypt(ck) == 3
    t = FheAsciiString.encrypt("  x ", ck)
    assert t.trim().decrypt(ck) == "x"


def test_full_width_surface(keyset):
    """All 82 reference Fhe widths exist (high_level_api/mod.rs pub use
    list: 2..16 even, 24..256 step 8, 512/1024/2048, signed + unsigned)."""
    from tfhe_tpu.hlapi import ALL_INT_TYPES, ALL_UINT_TYPES, FHE_WIDTHS
    assert len(FHE_WIDTHS) == 41
    assert len(ALL_UINT_TYPES) == len(ALL_INT_TYPES) == 41
    for w in (2, 14, 24, 104, 248, 2048):
        assert getattr(t, f"FheUint{w}").NUM_BITS == w
        assert getattr(t, f"FheInt{w}").NUM_BITS == w


def test_odd_width_roundtrip(keyset):
    """A step-8 width round-trips arithmetic (FheUint24 / FheInt40)."""
    ck = keyset.client_key
    a = t.FheUint24.encrypt(0xABCDE, ck)
    b = t.FheUint24.encrypt(0x10101, ck)
    assert (a + b).decrypt(ck) == (0xABCDE + 0x10101) % (1 << 24)
    s = t.FheInt40.encrypt(-12345, ck)
    assert (s - 7).decrypt(ck) == -12352


def test_scalar_bitwise_operators(keyset):
    """&, |, ^ with a plaintext int operand (incl. reflected forms)."""
    ck = keyset.client_key
    a = t.FheUint8.encrypt(0b1100_1010, ck)
    assert (a & 0b1111_0000).decrypt(ck) == 0b1100_0000
    assert (a | 0b0000_1111).decrypt(ck) == 0b1100_1111
    assert (a ^ 0b1111_1111).decrypt(ck) == 0b0011_0101
    assert (0b1111_0000 & a).decrypt(ck) == 0b1100_0000


def test_hlapi_shuffle_and_match(keyset):
    from tfhe_tpu.hlapi import bitonic_shuffle, match_value, match_value_or

    ck = keyset.client_key
    vals = [9, 4, 6]
    enc = [t.FheUint8.encrypt(v, ck) for v in vals]
    out = bitonic_shuffle(enc, key_bits=12, seed=3)
    assert sorted(x.decrypt(ck) for x in out) == sorted(vals)
    a = t.FheUint8.encrypt(4, ck)
    res, hit = match_value(a, [(4, 200), (9, 7)])
    assert res.decrypt(ck) == 200 and hit.decrypt(ck) is True
    assert match_value_or(a, [(5, 1)], 123).decrypt(ck) == 123
