"""Split family + padded-string closures
(strings/server_key/pattern/split/, concat.rs, pattern/replace.rs)."""

import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.strings.ciphertext import decrypt_string, encrypt_string
from tfhe_tpu.strings.server_key import StringServerKey


@pytest.fixture(scope="module")
def keys():
    ck, sk = integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x5971)
    return ck, StringServerKey(sk)


def dec_pieces(ck, pieces):
    out = []
    for piece, some in pieces:
        if not ck.decrypt_bool(some):
            break
        out.append(decrypt_string(ck, piece))
    return out


def test_split_basic(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    assert dec_pieces(ck, ssk.split(s, ".")) == ["a", "b", "c"]
    s = encrypt_string(ck, ".ab.")
    assert dec_pieces(ck, ssk.split(s, ".")) == ["", "ab", ""]


def test_split_overlap_ltr(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "aaa")
    assert dec_pieces(ck, ssk.split(s, "aa")) == "aaa".split("aa")


def test_split_padded(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "x.y", padding=2)
    assert dec_pieces(ck, ssk.split(s, ".")) == ["x", "y"]


def test_rsplit(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    assert dec_pieces(ck, ssk.rsplit(s, ".")) == list("a.b.c".rsplit("."))[::-1]
    s2 = encrypt_string(ck, "aaa")
    assert dec_pieces(ck, ssk.rsplit(s2, "aa")) == list("aaa".rsplit("aa"))[::-1]


def test_splitn(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    assert dec_pieces(ck, ssk.splitn(s, 2, ".")) == "a.b.c".split(".", 1)


def test_rsplitn(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    got = dec_pieces(ck, ssk.rsplitn(s, 2, "."))
    assert got == ["c", "a.b"]


def test_split_once(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "k=v=w")
    lhs, rhs, found = ssk.split_once(s, "=")
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, lhs) == "k"
    assert decrypt_string(ck, rhs) == "v=w"
    lhs, rhs, found = ssk.rsplit_once(s, "=")
    assert decrypt_string(ck, lhs) == "k=v"
    assert decrypt_string(ck, rhs) == "w"


def test_split_terminator(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.")
    assert dec_pieces(ck, ssk.split_terminator(s, ".")) == ["a", "b"]
    s2 = encrypt_string(ck, "a.b")
    assert dec_pieces(ck, ssk.split_terminator(s2, ".")) == ["a", "b"]


def test_split_inclusive(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.")
    assert dec_pieces(ck, ssk.split_inclusive(s, ".")) == ["a.", "b."]
    s2 = encrypt_string(ck, "a.b")
    assert dec_pieces(ck, ssk.split_inclusive(s2, ".")) == ["a.", "b"]


def test_split_empty_pattern(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "ab")
    assert dec_pieces(ck, ssk.split(s, "")) == ["", "a", "b", ""]
    assert dec_pieces(ck, ssk.rsplit(s, "")) == ["", "b", "a", ""]


def test_split_ascii_whitespace(keys):
    ck, ssk = keys
    s = encrypt_string(ck, " a bc ")
    assert dec_pieces(ck, ssk.split_ascii_whitespace(s)) == ["a", "bc"]


def test_concat_padded(keys):
    ck, ssk = keys
    a = encrypt_string(ck, "ab", padding=2)
    b = encrypt_string(ck, "cd")
    assert decrypt_string(ck, ssk.concat(a, b)) == "abcd"


def test_repeat_padded(keys):
    ck, ssk = keys
    a = encrypt_string(ck, "ab", padding=1)
    assert decrypt_string(ck, ssk.repeat(a, 3)) == "ababab"


def test_ends_with_padded(keys):
    ck, ssk = keys
    a = encrypt_string(ck, "abc", padding=2)
    assert ck.decrypt_bool(ssk.ends_with(a, "bc")) is True
    assert ck.decrypt_bool(ssk.ends_with(a, "ab")) is False
    assert ck.decrypt_bool(ssk.ends_with(a, "abc")) is True


def test_strip_suffix_padded(keys):
    ck, ssk = keys
    a = encrypt_string(ck, "abc", padding=2)
    out, found = ssk.strip_suffix(a, "bc")
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, out) == "a"
    out, found = ssk.strip_suffix(a, "xx")
    assert ck.decrypt_bool(found) is False
    assert decrypt_string(ck, out) == "abc"


def test_replace_length_changing(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b")
    assert decrypt_string(ck, ssk.replace_clear(s, ".", "::")) == "a::b"
    s2 = encrypt_string(ck, "aXbX")
    assert decrypt_string(ck, ssk.replace_clear(s2, "X", "")) == "ab"
