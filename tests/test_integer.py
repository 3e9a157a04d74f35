"""Integer (radix) op tests with fast insecure parameters.

Model: integer/server_key/radix_parallel/tests_unsigned/ — encrypted results
vs the cleartext model across representative operand pairs.
"""

import pytest

from tfhe_tpu import integer, shortint

NB = 4  # 4 blocks x 2 bits = 8-bit integers
MOD = 4 ** NB


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xB10C)


PAIRS = [(0, 0), (1, 1), (3, 200), (100, 155), (255, 255), (170, 85), (7, 250)]


def test_encrypt_decrypt(keys):
    ck, sk = keys
    for v in [0, 1, 77, 255]:
        assert ck.decrypt_radix(ck.encrypt_radix(v, NB)) == v


def test_add(keys):
    ck, sk = keys
    for a, b in PAIRS:
        out = sk.add_parallelized(ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB))
        assert ck.decrypt_radix(out) == (a + b) % MOD, (a, b)


def test_overflowing_add(keys):
    ck, sk = keys
    for a, b in [(200, 100), (1, 2), (255, 255), (128, 127)]:
        out, ov = sk.overflowing_add_parallelized(
            ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB))
        assert ck.decrypt_radix(out) == (a + b) % MOD
        assert ck.decrypt_bool(ov) == (a + b >= MOD), (a, b)


def test_sub_neg(keys):
    ck, sk = keys
    for a, b in PAIRS:
        out = sk.sub_parallelized(ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB))
        assert ck.decrypt_radix(out) == (a - b) % MOD, (a, b)
    out = sk.neg_parallelized(ck.encrypt_radix(100, NB))
    assert ck.decrypt_radix(out) == (-100) % MOD


def test_scalar_ops(keys):
    ck, sk = keys
    a = ck.encrypt_radix(123, NB)
    assert ck.decrypt_radix(sk.scalar_add_parallelized(a, 200)) == (123 + 200) % MOD
    assert ck.decrypt_radix(sk.scalar_sub_parallelized(a, 200)) == (123 - 200) % MOD
    assert ck.decrypt_radix(sk.scalar_mul_parallelized(a, 5)) == (123 * 5) % MOD


def test_mul(keys):
    ck, sk = keys
    for a, b in [(3, 5), (15, 17), (255, 2), (100, 100), (0, 77)]:
        out = sk.mul_parallelized(ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB))
        assert ck.decrypt_radix(out) == (a * b) % MOD, (a, b)


def test_bitwise(keys):
    ck, sk = keys
    for a, b in PAIRS:
        ea, eb = ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB)
        assert ck.decrypt_radix(sk.bitand_parallelized(ea, eb)) == a & b
        assert ck.decrypt_radix(sk.bitor_parallelized(ea, eb)) == a | b
        assert ck.decrypt_radix(sk.bitxor_parallelized(ea, eb)) == a ^ b
    assert ck.decrypt_radix(sk.bitnot(ck.encrypt_radix(170, NB))) == 255 - 170


def test_comparisons(keys):
    ck, sk = keys
    for a, b in [(5, 5), (3, 7), (200, 100), (255, 0)]:
        ea, eb = ck.encrypt_radix(a, NB), ck.encrypt_radix(b, NB)
        assert ck.decrypt_bool(sk.eq_parallelized(ea, eb)) == (a == b)
        assert ck.decrypt_bool(sk.ne_parallelized(ea, eb)) == (a != b)
        assert ck.decrypt_bool(sk.lt_parallelized(ea, eb)) == (a < b)
        assert ck.decrypt_bool(sk.le_parallelized(ea, eb)) == (a <= b)
        assert ck.decrypt_bool(sk.gt_parallelized(ea, eb)) == (a > b)
        assert ck.decrypt_bool(sk.ge_parallelized(ea, eb)) == (a >= b)


def test_select_min_max(keys):
    ck, sk = keys
    a, b = ck.encrypt_radix(42, NB), ck.encrypt_radix(99, NB)
    c1 = ck.encrypt_bool(True)
    c0 = ck.encrypt_bool(False)
    assert ck.decrypt_radix(sk.if_then_else_parallelized(c1, a, b)) == 42
    assert ck.decrypt_radix(sk.if_then_else_parallelized(c0, a, b)) == 99
    assert ck.decrypt_radix(sk.min_parallelized(a, b)) == 42
    assert ck.decrypt_radix(sk.max_parallelized(a, b)) == 99


def test_scalar_shifts(keys):
    ck, sk = keys
    for v, s in [(0b10110101, 3), (255, 1), (1, 7), (170, 2), (200, 0)]:
        ea = ck.encrypt_radix(v, NB)
        assert ck.decrypt_radix(sk.scalar_left_shift_parallelized(ea, s)) == (v << s) % MOD, (v, s)
        assert ck.decrypt_radix(sk.scalar_right_shift_parallelized(ea, s)) == v >> s, (v, s)


def test_sum_many(keys):
    ck, sk = keys
    vals = [13, 57, 200, 901 % 256, 33, 77, 250]
    cts = [ck.encrypt_radix(v, NB) for v in vals]
    out = sk.sum_ciphertexts(cts)
    assert ck.decrypt_radix(out) == sum(vals) % MOD
