"""OPRF, KVStore, Trivium, CompactPublicKey tests."""

import numpy as np
import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.apps.trivium import KreyviumStream, TriviumStream, transcipher_decrypt
from tfhe_tpu.hlapi.compact_list import CompactPublicKey
from tfhe_tpu.hlapi.kv_store import KVStore
from tfhe_tpu.shortint.oprf import generate_oblivious_pseudo_random


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xA11)


@pytest.fixture(scope="module")
def int_keys():
    return integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xA22)


def test_oprf_deterministic_and_in_range(keys):
    ck, sk = keys
    outs = []
    for seed in [1, 2, 3, 1]:
        ct = generate_oblivious_pseudo_random(sk, seed, random_bits_count=2)
        v = ck.decrypt_raw(ct) % 4
        outs.append(v)
        assert 0 <= v < 4
    assert outs[0] == outs[3]  # same seed -> same value


def test_oprf_roughly_uniform(keys):
    ck, sk = keys
    vals = [ck.decrypt_raw(generate_oblivious_pseudo_random(sk, s, 2)) % 4
            for s in range(40)]
    assert len(set(vals)) == 4  # all residues occur across 40 seeds


def test_kv_store(int_keys):
    ck, sk = int_keys
    store = KVStore(sk, num_blocks=3)
    store.insert_clear_key(5, ck.encrypt_radix(42, 3))
    store.insert_clear_key(9, ck.encrypt_radix(17, 3))
    got = store.get(ck.encrypt_radix(9, 3))
    assert ck.decrypt_radix(got) == 17
    got = store.get(ck.encrypt_radix(5, 3))
    assert ck.decrypt_radix(got) == 42
    got = store.get(ck.encrypt_radix(7, 3))
    assert ck.decrypt_radix(got) == 0  # absent
    store.update(ck.encrypt_radix(5, 3), ck.encrypt_radix(60, 3))
    assert ck.decrypt_radix(store.get(ck.encrypt_radix(5, 3))) == 60
    assert ck.decrypt_radix(store.get(ck.encrypt_radix(9, 3))) == 17


def test_trivium_clear_keystream_nontrivial():
    key = [bool((0x80 >> (i % 8)) & 1) for i in range(80)]
    iv = [False] * 80
    ts = TriviumStream(key, iv)
    bits = ts.next_bits(64)
    assert any(bits) and not all(bits)
    # determinism
    ts2 = TriviumStream(key, iv)
    assert ts2.next_bits(64) == bits


def test_kreyvium_clear_runs():
    key = [bool(i % 3 == 0) for i in range(128)]
    iv = [bool(i % 5 == 0) for i in range(128)]
    ks = KreyviumStream(key, iv)
    bits = ks.next_bits(32)
    assert any(bits) and not all(bits)


@pytest.mark.slow
def test_trivium_encrypted_matches_clear():
    from tfhe_tpu import boolean

    bck, bsk = boolean.gen_keys(boolean.TEST_PARAMETERS, seed=0x7111)
    key = [bool(i % 2) for i in range(80)]
    iv = [bool(i % 7 == 0) for i in range(80)]
    clear = TriviumStream(key, iv).next_bits(8)
    enc_stream = TriviumStream([bck.encrypt(b) for b in key],
                               [bck.encrypt(b) for b in iv], server_key=bsk)
    enc_bits = enc_stream.next_bits(8)
    assert [bck.decrypt(b) for b in enc_bits] == clear


def test_compact_public_key(int_keys):
    ck, sk = int_keys
    pk = CompactPublicKey(ck.key, seed=0xCAFE)
    msgs = [0, 1, 2, 3, 3, 1]
    packed = pk.encrypt_list(msgs)
    # compact: one (k+1)*N GLWE for 6 messages vs 6*(kN+1) LWE words
    expanded = packed.expand()
    sck = ck.key
    for m, ct in zip(msgs, expanded):
        assert sck.decrypt(ct) == m
    # build_with_proof now routes to the proven-compact-list implementation
    # (covered in tests/test_proven_compact_list.py); just check the plumb
    assert callable(pk.build_with_proof)


def test_kv_store_flags_and_compression(int_keys):
    from tfhe_tpu.shortint.compression import CompressionKey

    ck, sk = int_keys
    store = KVStore(sk, num_blocks=3)
    store.insert_clear_key(5, ck.encrypt_radix(42, 3))
    store.insert_clear_key(9, ck.encrypt_radix(17, 3))
    v, found = store.get_with_flag(ck.encrypt_radix(9, 3))
    assert ck.decrypt_radix(v) == 17 and ck.decrypt_bool(found) is True
    _, found = store.get_with_flag(ck.encrypt_radix(7, 3))
    assert ck.decrypt_bool(found) is False
    assert ck.decrypt_bool(store.contains_key(ck.encrypt_radix(5, 3))) is True
    assert ck.decrypt_bool(store.contains_value(ck.encrypt_radix(17, 3))) is True
    assert ck.decrypt_bool(store.contains_value(ck.encrypt_radix(1, 3))) is False
    assert store.contains_clear_key(5) and not store.contains_clear_key(6)
    assert store.remove_with_clear_key(9) is not None
    assert len(store) == 1

    comp_key = CompressionKey(ck.key, seed=0xC0)
    store.insert_clear_key(9, ck.encrypt_radix(13, 3))
    packed = store.compress(comp_key)
    store2 = packed.decompress(comp_key, sk)
    assert ck.decrypt_radix(store2.get(ck.encrypt_radix(9, 3))) == 13
    assert ck.decrypt_radix(store2.get(ck.encrypt_radix(5, 3))) == 42
