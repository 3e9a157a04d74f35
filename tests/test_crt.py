"""CRT integer tests (integer/server_key/crt_parallel/ analog).

Basis [3, 4] with 2_2 test params (both residues fit message_modulus=4,
pairwise coprime, product 12).
"""

import pytest

from tfhe_tpu import integer, shortint

BASIS = [3, 4]
MOD = 12


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xC47)


def test_crt_encrypt_decrypt(keys):
    ck, sk = keys
    for v in range(MOD):
        assert ck.decrypt_crt(ck.encrypt_crt(v, BASIS)) == v


def test_crt_add_sub_neg(keys):
    ck, sk = keys
    for a, b in [(0, 0), (5, 9), (11, 11), (7, 3)]:
        out = sk.add_crt_parallelized(ck.encrypt_crt(a, BASIS), ck.encrypt_crt(b, BASIS))
        assert ck.decrypt_crt(out) == (a + b) % MOD, (a, b)
        out = sk.sub_crt_parallelized(ck.encrypt_crt(a, BASIS), ck.encrypt_crt(b, BASIS))
        assert ck.decrypt_crt(out) == (a - b) % MOD, (a, b)
    out = sk.neg_crt_parallelized(ck.encrypt_crt(7, BASIS))
    assert ck.decrypt_crt(out) == (-7) % MOD


def test_crt_mul(keys):
    ck, sk = keys
    for a, b in [(5, 9), (11, 11), (2, 6), (0, 7)]:
        out = sk.mul_crt_parallelized(ck.encrypt_crt(a, BASIS), ck.encrypt_crt(b, BASIS))
        assert ck.decrypt_crt(out) == (a * b) % MOD, (a, b)


def test_crt_scalar_ops(keys):
    ck, sk = keys
    a = ck.encrypt_crt(7, BASIS)
    assert ck.decrypt_crt(sk.scalar_add_crt_parallelized(a, 8)) == (7 + 8) % MOD
    assert ck.decrypt_crt(sk.scalar_sub_crt_parallelized(a, 9)) == (7 - 9) % MOD
    assert ck.decrypt_crt(sk.scalar_mul_crt_parallelized(a, 5)) == (7 * 5) % MOD


def test_crt_chained_ops(keys):
    """Several ops without intermediate decryption."""
    ck, sk = keys
    a = ck.encrypt_crt(5, BASIS)
    b = ck.encrypt_crt(9, BASIS)
    s = sk.add_crt_parallelized(a, b)          # 2
    m = sk.mul_crt_parallelized(s, b)          # 18 % 12 = 6
    r = sk.sub_crt_parallelized(m, a)          # 1
    assert ck.decrypt_crt(r) == 1


def test_crt_basis_validation(keys):
    ck, sk = keys
    with pytest.raises(ValueError):
        ck.encrypt_crt(1, [2, 4])  # not coprime
    with pytest.raises(ValueError):
        ck.encrypt_crt(1, [5, 3])  # 5 > message_modulus
