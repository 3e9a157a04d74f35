"""Randomized op-sequence tests (integer/server_key/radix_parallel/
tests_long_run analog): hundreds of random ops chained on the same
ciphertexts, checking values against a plaintext model AND the
degree/noise invariants after every step.

The reference runs these for hours; here the chain length is sized for CI
(env TFHE_TPU_LONG_RUN_OPS overrides, so a soak run is one env var away).
"""

import os
import random

import pytest

from tfhe_tpu import integer, shortint

PARAMS = shortint.TEST_PARAM_MESSAGE_2_CARRY_2
N_OPS = int(os.environ.get("TFHE_TPU_LONG_RUN_OPS", "60"))
NB = 4  # FheUint8-equivalent


@pytest.fixture(scope="module")
def keys():
    return integer.gen_keys(PARAMS, seed=0x10A6)


def _check_invariants(sk, ct):
    p = sk.params
    for b in ct.blocks:
        assert b.degree <= p.total_modulus - 1, b.degree
        assert b.noise_level <= p.max_noise_level, b.noise_level
        assert b.message_modulus == p.message_modulus


def test_long_random_op_chain(keys):
    ck, sk = keys
    rng = random.Random(0xC0DE)
    mod = sk.msg ** NB

    n_cts = 4
    clear = [rng.randrange(mod) for _ in range(n_cts)]
    cts = [ck.encrypt_radix(v, NB) for v in clear]

    def binop(name, f):
        def run(i, j):
            cts[i] = getattr(sk, name)(cts[i], cts[j])
            clear[i] = f(clear[i], clear[j]) % mod
        return run

    def scalar_op(name, f):
        def run(i, j):
            s = rng.randrange(1, sk.msg ** 2)
            cts[i] = getattr(sk, name)(cts[i], s)
            clear[i] = f(clear[i], s) % mod
        return run

    def cmp_op(name, f):
        def run(i, j):
            cond = getattr(sk, name)(cts[i], cts[j])
            cts[i] = sk.if_then_else_parallelized(cond, cts[i], cts[j])
            clear[i] = clear[i] if f(clear[i], clear[j]) else clear[j]
        return run

    ops = [
        binop("add_parallelized", lambda x, y: x + y),
        binop("sub_parallelized", lambda x, y: x - y),
        binop("mul_parallelized", lambda x, y: x * y),
        binop("bitand_parallelized", lambda x, y: x & y),
        binop("bitor_parallelized", lambda x, y: x | y),
        binop("bitxor_parallelized", lambda x, y: x ^ y),
        binop("min_parallelized", min),
        binop("max_parallelized", max),
        scalar_op("scalar_add_parallelized", lambda x, s: x + s),
        scalar_op("scalar_mul_parallelized", lambda x, s: x * s),
        cmp_op("lt_parallelized", lambda x, y: x < y),
        cmp_op("ge_parallelized", lambda x, y: x >= y),
    ]

    for step in range(N_OPS):
        i, j = rng.sample(range(n_cts), 2)
        op = rng.choice(ops)
        op(i, j)
        _check_invariants(sk, cts[i])
        if step % 10 == 9:  # periodic full decrypt check
            for k in range(n_cts):
                got = ck.decrypt_radix(cts[k])
                assert got == clear[k], (step, k, got, clear[k])

    for k in range(n_cts):
        assert ck.decrypt_radix(cts[k]) == clear[k]


def test_long_run_signed_chain(keys):
    ck, sk = keys
    rng = random.Random(0x51C)
    half = sk.msg ** NB // 2

    a_c = rng.randrange(-half, half)
    b_c = rng.randrange(-half, half)
    a = ck.encrypt_signed_radix(a_c, NB)
    b = ck.encrypt_signed_radix(b_c, NB)

    def wrap(v):
        m = sk.msg ** NB
        return ((v + half) % m) - half

    for step in range(max(10, N_OPS // 4)):
        choice = rng.randrange(4)
        if choice == 0:
            a = sk.add_parallelized(a, b)
            a_c = wrap(a_c + b_c)
        elif choice == 1:
            a = sk.sub_parallelized(a, b)
            a_c = wrap(a_c - b_c)
        elif choice == 2:
            a = sk.neg_parallelized(a)
            a_c = wrap(-a_c)
        else:
            a = sk.abs_parallelized(a)
            a_c = wrap(abs(a_c))
        _check_invariants(sk, a)
    assert ck.decrypt_signed_radix(a) == a_c
