"""Encrypted-pattern (GenericPatternRef::Enc) parity for replace, the split
family, and strip_prefix/suffix — the round-2 VERDICT missing item #1
(reference: strings/server_key/pattern/replace.rs:89-98,
pattern/split/mod.rs:101,177).  Patterns are FheStrings, padded (hidden
length) and unpadded, checked against Python str semantics."""

import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.strings.ciphertext import decrypt_string, encrypt_string
from tfhe_tpu.strings.server_key import StringServerKey


@pytest.fixture(scope="module")
def keys():
    ck, sk = integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2,
                              seed=0x57E)
    return ck, StringServerKey(sk)


def dec_pieces(ck, pieces):
    out = []
    for piece, some in pieces:
        if not ck.decrypt_bool(some):
            break
        out.append(decrypt_string(ck, piece))
    return out


def test_contains_find_padded_enc_pattern(keys):
    """Hidden-length patterns: nul pattern positions match anything."""
    ck, ssk = keys
    s = encrypt_string(ck, "abcab")
    pat = encrypt_string(ck, "ab", padding=2)     # max_len 4, content "ab"
    assert ck.decrypt_bool(ssk.contains(s, pat)) is True
    found, idx = ssk.find(s, pat)
    assert ck.decrypt_bool(found) is True
    assert ck.decrypt_radix(idx) == 0
    found, idx = ssk.rfind(s, pat)
    assert ck.decrypt_radix(idx) == 3
    pat2 = encrypt_string(ck, "ca", padding=1)
    found, idx = ssk.find(s, pat2)
    assert ck.decrypt_bool(found) is True
    assert ck.decrypt_radix(idx) == 2
    pat3 = encrypt_string(ck, "zz", padding=1)
    assert ck.decrypt_bool(ssk.contains(s, pat3)) is False


def test_replace_enc_from_to(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "hello")
    frm = encrypt_string(ck, "l", padding=1)      # hidden length 1
    to = encrypt_string(ck, "r")
    got = decrypt_string(ck, ssk.replace(s, frm, to))
    assert got == "herro"


def test_replace_enc_length_changing(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "ababa")
    frm = encrypt_string(ck, "ab", padding=1)
    to = encrypt_string(ck, "z", padding=1)       # hidden-length replacement
    got = decrypt_string(ck, ssk.replace(s, frm, to))
    assert got == "zza"


def test_replacen_clear_count(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "aaaa")
    frm = encrypt_string(ck, "a")
    got = decrypt_string(ck, ssk.replacen(s, frm, "b", count=2))
    assert got == "bbaa"


def test_split_enc_pattern(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    pat = encrypt_string(ck, ".", padding=1)
    assert dec_pieces(ck, ssk.split(s, pat)) == ["a", "b", "c"]


def test_split_enc_pattern_multichar(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "xabyabz")
    pat = encrypt_string(ck, "ab")                # unpadded
    assert dec_pieces(ck, ssk.split(s, pat)) == ["x", "y", "z"]


def test_split_enc_empty_pattern(keys):
    """Encrypted-empty pattern selects the Rust split("") boundary form."""
    ck, ssk = keys
    s = encrypt_string(ck, "ab", padding=1)
    pat = encrypt_string(ck, "", padding=2)       # hidden-empty
    assert dec_pieces(ck, ssk.split(s, pat)) == ["", "a", "b", ""]


def test_rsplit_enc_pattern(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    pat = encrypt_string(ck, ".", padding=1)
    assert dec_pieces(ck, ssk.rsplit(s, pat)) == ["c", "b", "a"]


def test_splitn_enc_pattern(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.c")
    pat = encrypt_string(ck, ".")
    assert dec_pieces(ck, ssk.splitn(s, 2, pat)) == ["a", "b.c"]


def test_split_inclusive_enc_pattern(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "a.b.")
    pat = encrypt_string(ck, ".", padding=1)
    assert dec_pieces(ck, ssk.split_inclusive(s, pat)) == ["a.", "b."]


def test_strip_prefix_enc(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "foobar")
    pat = encrypt_string(ck, "foo", padding=1)
    out, found = ssk.strip_prefix(s, pat)
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, out) == "bar"
    pat2 = encrypt_string(ck, "bar", padding=1)
    out, found = ssk.strip_prefix(s, pat2)
    assert ck.decrypt_bool(found) is False
    assert decrypt_string(ck, out) == "foobar"


def test_strip_suffix_enc(keys):
    ck, ssk = keys
    s = encrypt_string(ck, "foobar", padding=2)
    pat = encrypt_string(ck, "bar", padding=1)
    out, found = ssk.strip_suffix(s, pat)
    assert ck.decrypt_bool(found) is True
    assert decrypt_string(ck, out) == "foo"
    pat2 = encrypt_string(ck, "foo")
    out, found = ssk.strip_suffix(s, pat2)
    assert ck.decrypt_bool(found) is False
    assert decrypt_string(ck, out) == "foobar"
