"""Round-coalescing scheduler (integer/scheduler.py): correctness AND the
coalescing property itself — a many-op call must issue exactly as many
device rounds as a single op, not N times as many."""

import numpy as np
import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.integer import scheduler as sched

PARAMS = shortint.TEST_PARAM_MESSAGE_2_CARRY_2


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(PARAMS, seed=0x5CED)


class RoundCounter:
    def __init__(self, sk):
        self.sk = sk
        self.calls = 0

    def __enter__(self):
        self._orig = self.sk.key.apply_lookup_table_batch

        def counted(*a, **k):
            self.calls += 1
            return self._orig(*a, **k)

        self.sk.key.apply_lookup_table_batch = counted
        return self

    def __exit__(self, *exc):
        self.sk.key.apply_lookup_table_batch = self._orig


def test_add_many_correct_and_coalesced(keys):
    ck, sk = keys
    rng = np.random.default_rng(0)
    vals = [(int(rng.integers(0, 200)), int(rng.integers(0, 55)))
            for _ in range(8)]
    pairs = [(ck.encrypt_radix(a, 4), ck.encrypt_radix(b, 4)) for a, b in vals]

    with RoundCounter(sk) as single:
        sk.add_parallelized(*pairs[0])
    with RoundCounter(sk) as many:
        outs = sched.add_many_parallelized(sk, pairs)
    for (a, b), o in zip(vals, outs):
        assert ck.decrypt_radix(o) == (a + b) % 256
    # coalescing: same number of device rounds as ONE add
    assert many.calls == single.calls, (many.calls, single.calls)


def test_sub_many(keys):
    ck, sk = keys
    pairs = [(ck.encrypt_radix(a, 4), ck.encrypt_radix(b, 4))
             for a, b in [(200, 55), (10, 20), (255, 255)]]
    outs = sched.sub_many_parallelized(sk, pairs)
    for (a, b), o in zip([(200, 55), (10, 20), (255, 255)], outs):
        assert ck.decrypt_radix(o) == (a - b) % 256


def test_cmp_many(keys):
    ck, sk = keys
    vals = [(5, 9), (9, 5), (7, 7), (0, 255)]
    pairs = [(ck.encrypt_radix(a, 4), ck.encrypt_radix(b, 4)) for a, b in vals]
    lts = sched.lt_many_parallelized(sk, pairs)
    eqs = sched.eq_many_parallelized(sk, pairs)
    ges = sched.ge_many_parallelized(sk, pairs)
    for (a, b), lt, eq, ge in zip(vals, lts, eqs, ges):
        assert ck.decrypt_bool(lt) == (a < b)
        assert ck.decrypt_bool(eq) == (a == b)
        assert ck.decrypt_bool(ge) == (a >= b)


def test_ite_many_coalesced(keys):
    ck, sk = keys
    conds = [ck.encrypt_bool(True), ck.encrypt_bool(False)]
    a = ck.encrypt_radix(111, 4)
    b = ck.encrypt_radix(222, 4)
    with RoundCounter(sk) as many:
        outs = sched.if_then_else_many_parallelized(
            sk, [(conds[0], a, b), (conds[1], a, b)])
    assert ck.decrypt_radix(outs[0]) == 111
    assert ck.decrypt_radix(outs[1]) == 222
    assert many.calls == 1  # one gated-LUT round for all cmuxes


def test_compare_exchange_many(keys):
    ck, sk = keys
    pairs = [(ck.encrypt_radix(9, 4), ck.encrypt_radix(4, 4)),
             (ck.encrypt_radix(1, 4), ck.encrypt_radix(8, 4))]
    out = sched.compare_exchange_many(sk, pairs, [True, False])
    assert ck.decrypt_radix(out[0][0]) == 4 and ck.decrypt_radix(out[0][1]) == 9
    assert ck.decrypt_radix(out[1][0]) == 8 and ck.decrypt_radix(out[1][1]) == 1


def test_mul_many_correct_and_coalesced(keys):
    """VERDICT r2 task 9: mul_many — block products + carry-save sums
    coalesced across items, within 2 rounds of a single mul (the shared
    carry-save schedule can take one extra extraction round when items'
    degree budgets interleave differently)."""
    ck, sk = keys
    rng = np.random.default_rng(3)
    vals = [(int(rng.integers(0, 256)), int(rng.integers(0, 256)))
            for _ in range(6)]
    pairs = [(ck.encrypt_radix(a, 4), ck.encrypt_radix(b, 4)) for a, b in vals]

    with RoundCounter(sk) as single:
        sk.mul_parallelized(*pairs[0])
    with RoundCounter(sk) as many:
        outs = sched.mul_many_parallelized(sk, pairs)
    for (a, b), o in zip(vals, outs):
        assert ck.decrypt_radix(o) == (a * b) % 256
    assert many.calls <= single.calls + 2, (many.calls, single.calls)


def test_bitwise_many_coalesced(keys):
    ck, sk = keys
    rng = np.random.default_rng(4)
    vals = [(int(rng.integers(0, 256)), int(rng.integers(0, 256)))
            for _ in range(5)]
    pairs = [(ck.encrypt_radix(a, 4), ck.encrypt_radix(b, 4)) for a, b in vals]
    with RoundCounter(sk) as many:
        outs = sched.bitxor_many_parallelized(sk, pairs)
    for (a, b), o in zip(vals, outs):
        assert ck.decrypt_radix(o) == a ^ b
    assert many.calls == 1, many.calls


def test_array_mul_routes_through_many(keys):
    """FheUintArray.__mul__ must coalesce (hlapi/array.py _MANY routing)."""
    from tfhe_tpu.hlapi import array as harr
    from tfhe_tpu.integer import scheduler as s2

    called = {}
    orig = s2.mul_many_parallelized

    def spy(sk, pairs):
        called["n"] = len(pairs)
        return orig(sk, pairs)

    s2.mul_many_parallelized = spy
    try:
        ck, sk = keys

        class _FakeKey:
            integer_key = sk

        import tfhe_tpu.hlapi.global_state as gs
        prev = gs._SERVER_KEY if hasattr(gs, "_SERVER_KEY") else None
        gs.set_server_key(_FakeKey())
        a_elems = [ck.encrypt_radix(v, 4) for v in (3, 5, 7)]
        b_elems = [ck.encrypt_radix(v, 4) for v in (2, 4, 6)]

        class _ET:
            @staticmethod
            def num_blocks(p):
                return 4

        arr_a = harr.FheUintArray(a_elems, (3,), _ET)
        arr_b = harr.FheUintArray(b_elems, (3,), _ET)
        out = arr_a * arr_b
        got = [ck.decrypt_radix(e) for e in out.elems]
        assert got == [6, 20, 42]
        assert called.get("n") == 3
    finally:
        s2.mul_many_parallelized = orig
