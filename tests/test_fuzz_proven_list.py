"""Deterministic mutation-fuzz campaign on ProvenCompactCiphertextList.

Analog of the reference's AFL campaign (utils/fuzz/README.md): the proven
compact list is THE type received from untrusted clients, and the safety
invariants are

1. deserialization (+ conformance) never crashes the process — any failure is
   a raised error, never a segfault or a silent corrupt object;
2. a mutated payload must NEVER verify (proof soundness under mutation);
3. if an attacker skips verification, expansion + compute must still either
   succeed or raise — never crash.

Three harnesses mirror harness-deser / harness-verify / harness-compute.
Mutations are seeded (reproducible): bit flips, truncations, byte
insertions, and CBOR-structural field swaps.
"""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.hlapi.compact_list import CompactPublicKey
from tfhe_tpu.hlapi.proven_compact_list import CompactPkeCrs, build_with_proof
from tfhe_tpu.utils import serialization as ser

# CPython-level crashes aside, every controlled failure must raise; we only
# exclude the process-killing exceptions from the allowed set.
FATAL = (SystemExit, KeyboardInterrupt, MemoryError)


@pytest.fixture(scope="module")
def corpus():
    ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xF0)
    pk = CompactPublicKey(ck, seed=0xF1)
    crs = CompactPkeCrs.new(ck.params, max_num_messages=2, seed=0xF2)
    lst = build_with_proof(pk, [3, 1], crs, metadata=b"fz", load="verify",
                           seed=0xF3)
    return ck, pk, crs, lst, ser.serialize(lst)


def _mutants(data: bytes, rng: np.random.Generator, count: int):
    """Seeded byte-level mutants: flips, truncations, insertions, splices."""
    out = []
    n = len(data)
    for _ in range(count):
        kind = rng.integers(0, 4)
        buf = bytearray(data)
        if kind == 0:  # bit flip(s)
            for _ in range(int(rng.integers(1, 8))):
                i = int(rng.integers(0, n))
                buf[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:  # truncate
            buf = buf[: int(rng.integers(0, n))]
        elif kind == 2:  # insert random bytes
            i = int(rng.integers(0, n))
            ins = bytes(rng.integers(0, 256, size=int(rng.integers(1, 16)),
                                     dtype=np.uint8))
            buf = buf[:i] + bytearray(ins) + buf[i:]
        else:  # splice: duplicate a window elsewhere
            i, j = sorted(int(v) for v in rng.integers(0, n, size=2))
            k = int(rng.integers(0, n))
            buf = buf[:k] + buf[i:j] + buf[k:]
        out.append(bytes(buf))
    return out


def test_harness_deser(corpus):
    """safe_deserialize on 200 mutants: raise or return, never crash."""
    _, _, _, _, data = corpus
    rng = np.random.default_rng(0xDE5E)
    survived = 0
    for mut in _mutants(data, rng, 200):
        try:
            obj = ser.safe_deserialize(
                mut, conformance=lambda c: c.message_modulus == 4)
            survived += 1
            assert obj.c1.dtype == np.uint64
        except FATAL:
            raise
        except Exception:
            pass  # controlled rejection
    # byte-level mutation of a checksummed-ish CBOR doc rarely survives,
    # but when it does the object must be structurally sound (checked above)
    assert survived < 200


def test_harness_verify(corpus):
    """Mutants that deserialize must never verify (proof soundness)."""
    ck, pk, crs, lst, data = corpus
    rng = np.random.default_rng(0xF1A9)
    checked = 0
    # structural mutations that keep the envelope parseable: tweak c1/c2
    # values, swap slots, and re-serialize — these always deserialize
    for _ in range(6):
        obj = ser.deserialize(data)
        which = rng.integers(0, 3)
        if which == 0:
            obj.c2 = obj.c2.copy()
            obj.c2[int(rng.integers(0, len(obj.c2)))] += np.uint64(1 << 59)
        elif which == 1:
            obj.c1 = obj.c1.copy()
            obj.c1[int(rng.integers(0, len(obj.c1)))] ^= np.uint64(1 << 40)
        else:
            obj.c2 = obj.c2[::-1].copy()
        try:
            assert not obj.verify(crs, pk, metadata=b"fz")
            checked += 1
        except FATAL:
            raise
        except AssertionError:
            raise
        except Exception:
            checked += 1  # raising is an acceptable rejection
    assert checked == 6
    # and wrong metadata on the untouched list
    assert not lst.verify(crs, pk, metadata=b"zf")


def test_harness_compute(corpus):
    """expand_without_verification + FHE compute on mutated-but-parseable
    lists: must complete or raise, never crash; results decrypt to *some*
    in-range value (garbage in, bounded garbage out)."""
    ck, pk, crs, lst, data = corpus
    sk = shortint.ServerKey(ck)
    rng = np.random.default_rng(0xC0DE)
    for _ in range(4):
        obj = ser.deserialize(data)
        obj.c2 = obj.c2.copy()
        obj.c2[int(rng.integers(0, len(obj.c2)))] = np.uint64(
            rng.integers(0, 1 << 63))
        try:
            cts = obj.expand_without_verification()
            acc = cts[0]
            acc = sk.unchecked_add(acc, cts[1])
            lut = sk.generate_lookup_table(lambda x: x % 4)
            acc = sk.apply_lookup_table(acc, lut)
            val = ck.decrypt(acc)
            assert 0 <= val < 4
        except FATAL:
            raise
        except Exception:
            pass


def test_proven_list_serialization_roundtrip(corpus):
    ck, pk, crs, lst, data = corpus
    obj = ser.safe_deserialize(data)
    assert np.array_equal(obj.c1, lst.c1)
    assert np.array_equal(obj.c2, lst.c2)
    assert obj.verify(crs, pk, metadata=b"fz")
    cts = obj.verify_and_expand(crs, pk, metadata=b"fz")
    assert [ck.decrypt(c) for c in cts] == [3, 1]
