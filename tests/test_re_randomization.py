"""Re-randomization tests (shortint/ciphertext/re_randomization.rs analog)."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.hlapi.compact_list import CompactPublicKey
from tfhe_tpu.shortint.re_randomization import ReRandomizationKey


@pytest.fixture(scope="module")
def keys():
    ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x2E2)
    pk = CompactPublicKey(ck, seed=0x2E3)
    return ck, ReRandomizationKey(pk)


def test_rerand_preserves_plaintext(keys):
    ck, rk = keys
    for m in range(4):
        ct = ck.encrypt(m)
        out = rk.re_randomize(ct, b"seed-1", b"ctx")
        assert ck.decrypt(out) == m, m


def test_rerand_changes_ciphertext_deterministically(keys):
    ck, rk = keys
    ct = ck.encrypt(2)
    a = rk.re_randomize(ct, b"seed-1", b"ctx")
    b = rk.re_randomize(ct, b"seed-1", b"ctx")
    c = rk.re_randomize(ct, b"seed-2", b"ctx")
    assert np.array_equal(np.asarray(a.data), np.asarray(b.data))       # deterministic
    assert not np.array_equal(np.asarray(a.data), np.asarray(c.data))   # seed-sensitive
    assert not np.array_equal(np.asarray(a.data), np.asarray(ct.data))  # actually changed
    d = rk.re_randomize(ct, b"seed-1", b"other-ctx")
    assert not np.array_equal(np.asarray(a.data), np.asarray(d.data))   # context-sensitive


def test_rerand_batch(keys):
    ck, rk = keys
    cts = [ck.encrypt(i % 4) for i in range(6)]
    outs = rk.re_randomize_batch(cts, b"batch-seed")
    for i, o in enumerate(outs):
        assert ck.decrypt(o) == i % 4
    # distinct slots get distinct zero encryptions
    assert not np.array_equal(np.asarray(outs[0].data) - np.asarray(cts[0].data),
                              np.asarray(outs[1].data) - np.asarray(cts[1].data))
