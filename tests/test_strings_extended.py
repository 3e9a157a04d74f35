"""Extended string ops: rfind, replace, trim family, strip, case-insensitive
equality (strings/server_key/pattern/{find,replace,strip}.rs, trim.rs)."""

import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.strings.ciphertext import decrypt_string, encrypt_string
from tfhe_tpu.strings.server_key import StringServerKey


@pytest.fixture(scope="module")
def keys():
    ck, sk = integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x577)
    return ck, StringServerKey(sk)


def test_rfind(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "abcabc")
    found, idx = ssk.rfind(s, "abc")
    assert ck.decrypt_bool(found) is True
    assert ck.decrypt_radix(idx) == 3
    found, _ = ssk.rfind(s, "xyz")
    assert ck.decrypt_bool(found) is False


def test_replace_clear(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "abcabc")
    out = ssk.replace_clear(s, "abc", "xyz")
    assert decrypt_string(ck, out) == "xyzxyz"
    out = ssk.replace_clear(s, "ca", "ZZ")
    assert decrypt_string(ck, out) == "abZZbc"
    # non-overlapping left-to-right: "aaa" with "aa"->"bb" gives "bba"
    s2 = encrypt_string(ck, "aaa")
    out = ssk.replace_clear(s2, "aa", "bb")
    assert decrypt_string(ck, out) == "bba"


def test_trim_end(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "hi  ")
    assert decrypt_string(ck, ssk.trim_end(s)) == "hi"
    s = encrypt_string(ck, "hi")
    assert decrypt_string(ck, ssk.trim_end(s)) == "hi"


def test_trim_start(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "  hi")
    assert decrypt_string(ck, ssk.trim_start(s)) == "hi"
    s = encrypt_string(ck, "hi ")
    assert decrypt_string(ck, ssk.trim_start(s)) == "hi "


def test_trim(keys):
    ck, ssk = keys
    s = encrypt_string(ck, " a b ")
    assert decrypt_string(ck, ssk.trim(s)) == "a b"


def test_strip_prefix_suffix(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "foobar")
    out, found = ssk.strip_prefix(s, "foo")
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, out) == "bar"
    out, found = ssk.strip_prefix(s, "bar")
    assert ck.decrypt_bool(found) is False
    assert decrypt_string(ck, out) == "foobar"
    out, found = ssk.strip_suffix(s, "bar")
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, out) == "foo"


def test_eq_ignore_case(keys):
    ck, ssk = keys
    a = encrypt_string(ck, "HeLLo")
    b = encrypt_string(ck, "hEllO")
    assert ck.decrypt_bool(ssk.eq_ignore_case(a, b)) is True
    c = encrypt_string(ck, "hella")
    assert ck.decrypt_bool(ssk.eq_ignore_case(a, c)) is False
