"""Extended integer op tests: div/rem, encrypted shifts, rotates, bit counts,
ilog2, abs, parity."""

import pytest

from tfhe_tpu import integer, shortint

NB = 3  # 6-bit integers keep division fast in tests
MOD = 4 ** NB
BITS = 6


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xD1F)


def test_overflowing_sub(keys):
    ck, sk = keys
    for a, b in [(5, 3), (3, 5), (0, 0), (63, 1), (0, 63)]:
        out, borrow = sk.overflowing_sub_parallelized(
            ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB))
        assert ck.decrypt_radix(out) == (a - b) % MOD
        assert ck.decrypt_bool(borrow) == (a < b), (a, b)


def test_extract_bits_roundtrip(keys):
    ck, sk = keys
    v = 0b101101
    bits = sk.extract_bits(ck.encrypt_radix(v, NB))
    got = [ck.key.decrypt_raw(b) for b in bits]
    assert got == [(v >> i) & 1 for i in range(BITS)]


def test_div_rem(keys):
    ck, sk = keys
    for a, d in [(42, 5), (63, 7), (10, 3), (5, 63), (0, 3)]:
        q, r = sk.div_rem_parallelized(ck.encrypt_radix(a, NB), ck.encrypt_radix(d, NB))
        assert ck.decrypt_radix(q) == a // d, (a, d)
        assert ck.decrypt_radix(r) == a % d, (a, d)


def test_encrypted_shifts(keys):
    ck, sk = keys
    for v, s in [(0b101101, 2), (63, 0), (1, 5), (32, 3)]:
        ea = ck.encrypt_radix(v, NB)
        es = ck.encrypt_radix(s, NB)
        assert ck.decrypt_radix(sk.left_shift_parallelized(ea, es)) == (v << s) % MOD, (v, s)
        assert ck.decrypt_radix(sk.right_shift_parallelized(ea, es)) == v >> s, (v, s)


def test_rotates(keys):
    ck, sk = keys

    def rotl(v, r):
        r %= BITS
        return ((v << r) | (v >> (BITS - r))) % MOD if r else v

    for v, r in [(0b101101, 2), (1, 5), (0b110000, 3)]:
        ea = ck.encrypt_radix(v, NB)
        assert ck.decrypt_radix(sk.scalar_rotate_left_parallelized(ea, r)) == rotl(v, r), (v, r)
        assert ck.decrypt_radix(sk.scalar_rotate_right_parallelized(ea, r)) == rotl(v, BITS - r), (v, r)
        er = ck.encrypt_radix(r, NB)
        assert ck.decrypt_radix(sk.rotate_left_parallelized(ea, er)) == rotl(v, r), (v, r)


def test_counts_and_ilog2(keys):
    ck, sk = keys
    for v in [0b101101, 0, 63, 1, 32]:
        ea = ck.encrypt_radix(v, NB)
        assert ck.decrypt_radix(sk.count_ones_parallelized(ea)) == bin(v).count("1"), v
        assert ck.decrypt_radix(sk.count_zeros_parallelized(ea)) == BITS - bin(v).count("1"), v
        lz = BITS - v.bit_length()
        assert ck.decrypt_radix(sk.leading_zeros_parallelized(ea)) == lz, v
        tz = BITS if v == 0 else (v & -v).bit_length() - 1
        assert ck.decrypt_radix(sk.trailing_zeros_parallelized(ea)) == tz, v
        if v > 0:
            assert ck.decrypt_radix(sk.ilog2_parallelized(ea)) == v.bit_length() - 1, v


def test_abs_and_parity(keys):
    ck, sk = keys
    for v in [5, -5, 0, -32, 31]:
        ea = integer.RadixCiphertext(ck.encrypt_signed_radix(v, NB).blocks)
        assert ck.decrypt_radix(sk.abs_parallelized(ea)) == abs(v) % MOD, v
    ea = ck.encrypt_radix(6, NB)
    assert ck.decrypt_bool(sk.is_even_parallelized(ea)) is True
    assert ck.decrypt_bool(sk.is_odd_parallelized(ea)) is False


def test_reverse_bits(keys):
    ck, sk = keys
    for v in [0b10110100, 1, 0]:
        out = sk.reverse_bits_parallelized(ck.encrypt_radix(v, 4))
        assert ck.decrypt_radix(out) == int(f"{v:08b}"[::-1], 2), v


def test_scalar_bitslice(keys):
    ck, sk = keys
    a = ck.encrypt_radix(0b10110110, 4)
    out = sk.scalar_bitslice_parallelized(a, 2, 6)
    assert ck.decrypt_radix(out) == (0b10110110 >> 2) & 0xF


def test_boolean_dot_prod(keys):
    ck, sk = keys
    bools = [ck.encrypt_bool(b) for b in [True, False, True, True]]
    out = sk.boolean_dot_prod_parallelized(bools, [10, 20, 30, 40], 4)
    assert ck.decrypt_radix(out) == 10 + 30 + 40


def test_vector_ops(keys):
    ck, sk = keys
    hay = [ck.encrypt_radix(v, 4) for v in [5, 9, 200, 9]]
    needle = ck.encrypt_radix(9, 4)
    assert ck.decrypt_bool(sk.contains_parallelized(hay, needle)) is True
    found, idx = sk.index_of_parallelized(hay, needle)
    assert ck.decrypt_bool(found) is True
    assert ck.decrypt_radix(idx) == 1
    missing = ck.encrypt_radix(77, 4)
    found, _ = sk.index_of_parallelized(hay, missing)
    assert ck.decrypt_bool(found) is False
    lhs = [ck.encrypt_radix(v, 4) for v in [1, 2]]
    rhs = [ck.encrypt_radix(v, 4) for v in [1, 2]]
    assert ck.decrypt_bool(sk.all_eq_slices_parallelized(lhs, rhs)) is True
    rhs2 = [ck.encrypt_radix(v, 4) for v in [1, 3]]
    assert ck.decrypt_bool(sk.all_eq_slices_parallelized(lhs, rhs2)) is False


def test_count_consecutive_bits(keys):
    ck, sk = keys
    a = ck.encrypt_radix(0b11100101, 4)
    out = sk.count_consecutive_bits_parallelized(a, 1, from_msb=True)
    assert ck.decrypt_radix(out) == 3
    out = sk.count_consecutive_bits_parallelized(a, 0, from_msb=False)
    assert ck.decrypt_radix(out) == 0
    b = ck.encrypt_radix(0b11101000, 4)
    out = sk.count_consecutive_bits_parallelized(b, 0, from_msb=False)
    assert ck.decrypt_radix(out) == 3


def test_bitonic_sort(keys):
    ck, sk = keys
    vals = [200, 3, 77, 3, 255, 0]
    enc = [ck.encrypt_radix(v, 4) for v in vals]
    out = sk.sort_parallelized(enc)
    assert [ck.decrypt_radix(o) for o in out] == sorted(vals)
    out = sk.sort_parallelized(enc, ascending=False)
    assert [ck.decrypt_radix(o) for o in out] == sorted(vals, reverse=True)


def test_radix_modulus_switched_compression(keys):
    ck, sk = keys
    for cls_enc, dec, vals in (
        (lambda v: ck.encrypt_radix(v, 4), lambda c: ck.decrypt_radix(c), (0, 177, 255)),
        (lambda v: ck.encrypt_signed_radix(v, 4), lambda c: ck.decrypt_signed_radix(c), (-100, 37)),
    ):
        for v in vals:
            comp = sk.switch_modulus_and_compress(cls_enc(v))
            back = sk.decompress(comp)
            assert dec(back) == v, v
            # signedness preserved through the roundtrip
            from tfhe_tpu.integer.ciphertext import SignedRadixCiphertext
            assert isinstance(back, SignedRadixCiphertext) == comp.signed


def test_match_value(keys):
    ck, sk = keys
    matches = [(2, 17), (5, 99), (9, 3)]
    for v, want, hit in ((5, 99, True), (2, 17, True), (7, 0, False)):
        a = ck.encrypt_radix(v, 4)
        res, matched = sk.match_value_parallelized(a, matches)
        assert ck.decrypt_radix(res) == want
        assert ck.decrypt_bool(matched) == hit
    a = ck.encrypt_radix(7, 4)
    out = sk.match_value_or_parallelized(a, matches, 42)
    assert ck.decrypt_radix(out) == 42
    out2 = sk.match_value_or_parallelized(ck.encrypt_radix(9, 4), matches, 42)
    assert ck.decrypt_radix(out2) == 3


def test_bitonic_shuffle(keys):
    """Shuffle is a permutation; with a wide OPRF key it is seed-dependent."""
    from tfhe_tpu.integer.oprf import OprfServerKey

    ck, sk = keys
    ok = OprfServerKey.from_compute_key(sk)
    vals = [3, 1, 7, 5, 2]
    enc = [ck.encrypt_radix(v, 2) for v in vals]
    out = sk.bitonic_shuffle(ok, enc, key_bits=16, seed=0xA5)
    dec = [ck.decrypt_radix(c) for c in out]
    assert sorted(dec) == sorted(vals), dec
    out2 = sk.bitonic_shuffle(ok, enc, key_bits=16, seed=0xB7)
    dec2 = [ck.decrypt_radix(c) for c in out2]
    assert sorted(dec2) == sorted(vals)
