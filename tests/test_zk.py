"""ZK proof tests: BLS12-446 pairing properties + pke v1 prove/verify
(tfhe-zk-pok/src/proofs/pke/mod.rs tests analog, small insecure sizes)."""

import random

import pytest

from tfhe_tpu.zk import curve446 as cv
from tfhe_tpu.zk import pke

D, K, B, Q, T, MSBS = 64, 2, 1 << 6, 0, 32, 1
M64 = 1 << 64


def center_mod_q(x: int, q: int) -> int:
    if q == 0:
        x &= M64 - 1
        return x - M64 if x >= M64 // 2 else x
    r = x % q
    return r - q if 2 * r >= q else r


def polymul_rev(a, b):
    d = len(a)
    c = [0] * d
    for i in range(d):
        for j in range(d):
            t = a[i] * b[d - j - 1]
            if i + j < d:
                c[i + j] += t
            else:
                c[i + j - d] -= t
    return c


def gen_testcase(rng: random.Random):
    t_eff = T >> MSBS
    q_dec = pke._decode_q(Q)
    delta = q_dec // T
    a = [center_mod_q(rng.randrange(q_dec), Q) for _ in range(D)]
    s = [rng.randrange(2) for _ in range(D)]
    e_pk = [rng.randrange(-B, B) for _ in range(D)]
    b = [center_mod_q(x + e, Q) for x, e in zip(polymul_rev(a, s), e_pk)]
    r = [rng.randrange(2) for _ in range(D)]
    e1 = [rng.randrange(-B, B) for _ in range(D)]
    e2 = [rng.randrange(-B, B) for _ in range(K)]
    m = [rng.randrange(t_eff) for _ in range(K)]
    c1 = [center_mod_q(x + e, Q) for x, e in zip(polymul_rev(a, r), e1)]
    c2 = []
    for i in range(K):
        dot = 0
        for j in range(D):
            bv = b[D - j - i - 1] if i + j < D else -b[2 * D - j - i - 1]
            dot += r[D - j - 1] * bv
        c2.append(center_mod_q(dot + e2[i] + delta * m[i], Q))
    return (pke.PublicCommit(a, b, c1, c2), pke.PrivateCommit(r, e1, m, e2))


@pytest.fixture(scope="module")
def crs():
    return pke.crs_gen(D, K, B, Q, T, MSBS, seed=0x2A)


@pytest.fixture(scope="module")
def case(crs):
    rng = random.Random(7)
    return gen_testcase(rng)


def test_prove_verify_compute_load_proof(crs, case):
    pc, priv = case
    proof = pke.prove(crs, pc, priv, metadata=b"meta", load="proof", seed=b"s1")
    assert pke.verify(proof, crs, pc, metadata=b"meta")


def test_prove_verify_compute_load_verify(crs, case):
    pc, priv = case
    proof = pke.prove(crs, pc, priv, metadata=b"meta", load="verify", seed=b"s2")
    assert proof.c_hat_t is None
    assert pke.verify(proof, crs, pc, metadata=b"meta")


def test_wrong_metadata_rejected(crs, case):
    pc, priv = case
    proof = pke.prove(crs, pc, priv, metadata=b"meta", load="verify", seed=b"s3")
    assert not pke.verify(proof, crs, pc, metadata=b"other")


def test_tampered_ciphertext_rejected(crs, case):
    pc, priv = case
    proof = pke.prove(crs, pc, priv, metadata=b"m", load="verify", seed=b"s4")
    bad = pke.PublicCommit(pc.a, pc.b, pc.c1, [center_mod_q(pc.c2[0] + 1, Q)] + pc.c2[1:])
    assert not pke.verify(proof, crs, bad, metadata=b"m")


def test_oversized_noise_rejected(crs):
    """A dishonest encryption with noise >= B cannot produce a valid proof
    (the bit decomposition of e overflows its budget)."""
    rng = random.Random(8)
    pc, priv = gen_testcase(rng)
    # corrupt: bump e1[0] beyond the bound and recompute c1 accordingly
    priv.e1[0] += 4 * B
    c1 = [center_mod_q(x + e, Q) for x, e in zip(polymul_rev(pc.a, priv.r), priv.e1)]
    pc = pke.PublicCommit(pc.a, pc.b, c1, pc.c2)
    proof = pke.prove(crs, pc, priv, metadata=b"m", load="verify", seed=b"s5")
    assert not pke.verify(proof, crs, pc, metadata=b"m")


def test_proof_serialization_roundtrip(crs, case):
    from tfhe_tpu.utils.serialization import deserialize, serialize

    pc, priv = case
    proof = pke.prove(crs, pc, priv, metadata=b"m", load="proof", seed=b"s9")
    back = deserialize(serialize(proof))
    assert back == proof
    assert pke.verify(back, crs, pc, metadata=b"m")
