"""Signed (two's-complement) radix op tests with fast insecure parameters.

Model: integer/server_key/radix_parallel/tests_signed/ — every signed op
family against the cleartext model, including the sign-sensitive cases
(comparisons across the sign boundary, truncated division, arithmetic
shifts, overflow detection).
"""

import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.integer.ciphertext import RadixCiphertext, SignedRadixCiphertext

NB = 4  # 4 blocks x 2 bits = signed 8-bit: [-128, 127]
MOD = 4 ** NB
HALF = MOD // 2


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x51C)


PAIRS = [(0, 0), (-1, 1), (5, -3), (-100, 27), (-128, -1), (127, -128),
         (-37, -41), (60, 60)]


def _enc(ck, v):
    return ck.encrypt_signed_radix(v, NB)


def test_encrypt_decrypt_signed(keys):
    ck, sk = keys
    for v in [0, 1, -1, 127, -128, -77]:
        assert ck.decrypt_signed_radix(_enc(ck, v)) == v


def _wrap(v):
    v %= MOD
    return v - MOD if v >= HALF else v


def test_signed_add_sub_neg(keys):
    ck, sk = keys
    for a, b in PAIRS:
        out = sk.add_parallelized(_enc(ck, a), _enc(ck, b))
        assert isinstance(out, SignedRadixCiphertext)
        assert ck.decrypt_signed_radix(out) == _wrap(a + b), (a, b)
        out = sk.sub_parallelized(_enc(ck, a), _enc(ck, b))
        assert ck.decrypt_signed_radix(out) == _wrap(a - b), (a, b)
    out = sk.neg_parallelized(_enc(ck, -77))
    assert isinstance(out, SignedRadixCiphertext)
    assert ck.decrypt_signed_radix(out) == 77


def test_signed_mul(keys):
    ck, sk = keys
    for a, b in [(3, -5), (-7, -9), (-128, 2), (11, 11)]:
        out = sk.mul_parallelized(_enc(ck, a), _enc(ck, b))
        assert ck.decrypt_signed_radix(out) == _wrap(a * b), (a, b)


def test_signed_comparisons(keys):
    ck, sk = keys
    for a, b in [(-1, 1), (1, -1), (-5, -3), (-128, 127), (0, -1), (50, 50),
                 (-60, -60)]:
        ea, eb = _enc(ck, a), _enc(ck, b)
        assert ck.decrypt_bool(sk.lt_parallelized(ea, eb)) == (a < b), (a, b)
        assert ck.decrypt_bool(sk.le_parallelized(ea, eb)) == (a <= b), (a, b)
        assert ck.decrypt_bool(sk.gt_parallelized(ea, eb)) == (a > b), (a, b)
        assert ck.decrypt_bool(sk.ge_parallelized(ea, eb)) == (a >= b), (a, b)
        assert ck.decrypt_bool(sk.eq_parallelized(ea, eb)) == (a == b), (a, b)


def test_signed_scalar_comparisons(keys):
    ck, sk = keys
    for a, s in [(-5, 3), (-5, -5), (-5, -100), (100, -1), (0, 0), (-128, -128)]:
        ea = _enc(ck, a)
        assert ck.decrypt_bool(sk.scalar_lt_parallelized(ea, s)) == (a < s), (a, s)
        assert ck.decrypt_bool(sk.scalar_ge_parallelized(ea, s)) == (a >= s), (a, s)
        assert ck.decrypt_bool(sk.scalar_eq_parallelized(ea, s)) == (a == s), (a, s)


def test_signed_min_max_ite(keys):
    ck, sk = keys
    for a, b in [(-5, 3), (7, -100), (-2, -3)]:
        mn = sk.min_parallelized(_enc(ck, a), _enc(ck, b))
        mx = sk.max_parallelized(_enc(ck, a), _enc(ck, b))
        assert isinstance(mn, SignedRadixCiphertext)
        assert ck.decrypt_signed_radix(mn) == min(a, b), (a, b)
        assert ck.decrypt_signed_radix(mx) == max(a, b), (a, b)


def test_signed_abs(keys):
    ck, sk = keys
    for a in [0, 5, -5, -128, 127]:
        out = sk.abs_parallelized(_enc(ck, a))
        assert ck.decrypt_signed_radix(out) == _wrap(abs(a)), a


def test_signed_div_rem(keys):
    ck, sk = keys
    for a, b in [(7, 2), (-7, 2), (7, -2), (-7, -2), (100, -9), (-128, 3)]:
        q, r = sk.div_rem_parallelized(_enc(ck, a), _enc(ck, b))
        # Rust semantics: truncation toward zero, remainder has dividend sign
        exp_q = int(a / b) if b else None
        exp_r = a - exp_q * b if b else a
        assert ck.decrypt_signed_radix(q) == exp_q, (a, b)
        assert ck.decrypt_signed_radix(r) == exp_r, (a, b)


def test_signed_div_by_zero(keys):
    """Emergent circuit behavior (matches the reference circuit: unsigned
    all-ones quotient, conditionally negated): q = -1 for a >= 0, +1 for
    a < 0; remainder keeps the numerator.  Explicitly 'not to be relied on'
    in the reference docs — this just pins our circuit."""
    ck, sk = keys
    q, r = sk.div_rem_parallelized(_enc(ck, 5), _enc(ck, 0))
    assert ck.decrypt_signed_radix(q) == -1
    assert ck.decrypt_signed_radix(r) == 5
    q, r = sk.div_rem_parallelized(_enc(ck, -5), _enc(ck, 0))
    assert ck.decrypt_signed_radix(q) == 1
    assert ck.decrypt_signed_radix(r) == -5


def test_arithmetic_right_shift(keys):
    ck, sk = keys
    for a in [-100, -1, 73, -128]:
        for sh in [0, 1, 3, 5, 7]:
            out = sk.scalar_right_shift_parallelized(_enc(ck, a), sh)
            assert isinstance(out, SignedRadixCiphertext)
            assert ck.decrypt_signed_radix(out) == (a >> sh), (a, sh)


def test_signed_left_shift(keys):
    ck, sk = keys
    for a in [-100, 3]:
        for sh in [1, 4]:
            out = sk.scalar_left_shift_parallelized(_enc(ck, a), sh)
            assert ck.decrypt_signed_radix(out) == _wrap(a << sh), (a, sh)


def test_signed_encrypted_shift(keys):
    ck, sk = keys
    amt = ck.encrypt_radix(3, NB)
    out = sk.right_shift_parallelized(_enc(ck, -100), amt)
    assert ck.decrypt_signed_radix(out) == (-100 >> 3)


def test_signed_overflowing_add_sub(keys):
    ck, sk = keys
    for a, b in [(100, 100), (-100, -100), (-128, -1), (127, 1), (5, -3),
                 (-128, 1), (127, -1)]:
        out, ovf = sk.signed_overflowing_add_parallelized(_enc(ck, a), _enc(ck, b))
        assert ck.decrypt_signed_radix(out) == _wrap(a + b), (a, b)
        assert ck.decrypt_bool(ovf) == (not -HALF <= a + b < HALF), ("add", a, b)
        out, ovf = sk.signed_overflowing_sub_parallelized(_enc(ck, a), _enc(ck, b))
        assert ck.decrypt_signed_radix(out) == _wrap(a - b), (a, b)
        assert ck.decrypt_bool(ovf) == (not -HALF <= a - b < HALF), ("sub", a, b)


def test_casts(keys):
    ck, sk = keys
    # signed -> wider signed: sign extension
    a = _enc(ck, -5)
    wide = sk.cast_to_signed(a, 8)
    assert ck.decrypt_signed_radix(wide) == -5
    wide_u = sk.cast_to_unsigned(a, 8)
    assert ck.decrypt_radix(wide_u) == (-5) % (4 ** 8)
    # truncate back
    narrow = sk.cast_to_signed(wide, NB)
    assert ck.decrypt_signed_radix(narrow) == -5
    # unsigned -> signed reinterpret
    u = ck.encrypt_radix(200, NB)
    s = sk.cast_to_signed(u, NB)
    assert ck.decrypt_signed_radix(s) == 200 - MOD


def test_signed_scalar_ops(keys):
    ck, sk = keys
    a = _enc(ck, -50)
    assert ck.decrypt_signed_radix(sk.scalar_add_parallelized(a, 20)) == -30
    assert ck.decrypt_signed_radix(sk.scalar_sub_parallelized(a, -20)) == -30
    assert ck.decrypt_signed_radix(sk.scalar_mul_parallelized(a, -2)) == 100


def test_hlapi_fheint(keys):
    """FheInt8 end-to-end through the high-level API (signed dispatch)."""
    from tfhe_tpu.hlapi import global_state
    from tfhe_tpu.hlapi.types import FheInt8

    ck, sk = keys

    class _CK:
        integer_key = ck

    class _SK:
        integer_key = sk

    global_state.set_server_key(_SK())
    a = FheInt8.encrypt(-100, _CK())
    b = FheInt8.encrypt(27, _CK())
    assert (a + b).decrypt(_CK()) == -73
    assert (a * b).decrypt(_CK()) == _wrap(-100 * 27)
    assert a.lt(b).decrypt(_CK()) is True
    assert (a >> 2).decrypt(_CK()) == -25
    assert a.abs().decrypt(_CK()) == 100
    q = a / b
    assert q.decrypt(_CK()) == int(-100 / 27)
