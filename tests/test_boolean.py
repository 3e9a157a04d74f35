"""Boolean gate API tests (model: boolean/server_key tests — full truth
tables for every gate, plus trivial short-circuits and packed batches)."""

import itertools

import pytest

from tfhe_tpu import boolean


@pytest.fixture(scope="module")
def keys():
    return boolean.gen_keys(boolean.TEST_PARAMETERS, seed=0xB001)


GATES = {
    "and": lambda x, y: x and y,
    "or": lambda x, y: x or y,
    "xor": lambda x, y: x != y,
    "nand": lambda x, y: not (x and y),
    "nor": lambda x, y: not (x or y),
    "xnor": lambda x, y: x == y,
}


def test_encrypt_decrypt(keys):
    ck, sk = keys
    assert ck.decrypt(ck.encrypt(True)) is True
    assert ck.decrypt(ck.encrypt(False)) is False


def test_all_gates_truth_tables(keys):
    ck, sk = keys
    # all 6 gates x 4 input combos in two packed calls
    combos = list(itertools.product([False, True], repeat=2))
    kinds, lhs, rhs, expected = [], [], [], []
    for name, f in GATES.items():
        for a, b in combos:
            kinds.append(name)
            lhs.append(ck.encrypt(a))
            rhs.append(ck.encrypt(b))
            expected.append(f(a, b))
    outs = sk.gates_packed(kinds, lhs, rhs)
    got = [ck.decrypt(o) for o in outs]
    assert got == expected


def test_not_and_trivial(keys):
    ck, sk = keys
    assert ck.decrypt(sk.not_(ck.encrypt(True))) is False
    assert ck.decrypt(sk.not_(ck.encrypt(False))) is True
    t = boolean.Ciphertext.new_trivial(True)
    f = boolean.Ciphertext.new_trivial(False)
    assert ck.decrypt(sk.and_(t, f)) is False  # fully trivial, no PBS
    # mixed trivial/encrypted
    assert ck.decrypt(sk.and_(t, ck.encrypt(True))) is True
    assert ck.decrypt(sk.or_(f, ck.encrypt(False))) is False


def test_mux(keys):
    ck, sk = keys
    for c, a, b in itertools.product([False, True], repeat=3):
        out = sk.mux(ck.encrypt(c), ck.encrypt(a), ck.encrypt(b))
        assert ck.decrypt(out) == (a if c else b), (c, a, b)
