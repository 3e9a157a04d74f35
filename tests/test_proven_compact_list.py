"""ProvenCompactCiphertextList: compact-PKE encryption with a pke-v1 ZK
proof, verify_and_expand (high_level_api/compact_list.rs:20 analog)."""

import time

import pytest

from tfhe_tpu import shortint
from tfhe_tpu.hlapi.compact_list import CompactPublicKey
from tfhe_tpu.hlapi.proven_compact_list import (
    CompactPkeCrs,
    build_with_proof,
)


@pytest.fixture(scope="module")
def setup():
    ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x99)
    pk = CompactPublicKey(ck, seed=0x9A)
    crs = CompactPkeCrs.new(ck.params, max_num_messages=2, seed=0x9B)
    return ck, pk, crs


@pytest.mark.slow
def test_proven_list_roundtrip(setup):
    ck, pk, crs = setup
    msgs = [3, 1]
    lst = build_with_proof(pk, msgs, crs, metadata=b"ctx", load="verify", seed=0x9C)
    cts = lst.verify_and_expand(crs, pk, metadata=b"ctx")
    for m, ct in zip(msgs, cts):
        assert ck.decrypt(ct) == m, m


@pytest.mark.slow
def test_proven_list_tamper_rejected(setup):
    ck, pk, crs = setup
    lst = build_with_proof(pk, [2, 0], crs, metadata=b"ctx", load="verify", seed=0x9D)
    import numpy as np

    lst.c2 = lst.c2 + np.uint64(1 << 59)  # shift the message
    with pytest.raises(ValueError):
        lst.verify_and_expand(crs, pk, metadata=b"ctx")


@pytest.mark.slow
def test_proven_list_wrong_metadata(setup):
    ck, pk, crs = setup
    lst = build_with_proof(pk, [1], crs, metadata=b"a", load="verify", seed=0x9E)
    assert not lst.verify(crs, pk, metadata=b"b")


@pytest.mark.slow
def test_proven_list_pke_v2(setup):
    """Same flow through the pke_v2 scheme (the reference's default)."""
    ck, pk, _ = setup
    crs2 = CompactPkeCrs.new(ck.params, max_num_messages=2, seed=0xB2,
                             scheme="v2")
    msgs = [2, 3]
    lst = build_with_proof(pk, msgs, crs2, metadata=b"ctx", load="verify",
                           seed=0xB3)
    cts = lst.verify_and_expand(crs2, pk, metadata=b"ctx")
    for m, ct in zip(msgs, cts):
        assert ck.decrypt(ct) == m, m
    assert not lst.verify(crs2, pk, metadata=b"other")
