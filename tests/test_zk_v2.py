"""pke_v2 proof-system tests (tfhe-zk-pok/src/proofs/pke_v2/mod.rs analog,
small insecure sizes): honest prove/verify in both compute loads, Fiat-Shamir
binding, tamper rejection, and — via _sanity_check=False, the analog of the
reference's ProofSanityCheckMode::Ignore — rejection of forged proofs whose
witness noise exceeds the CRS bound."""

import random

import pytest

from tfhe_tpu.zk import pke_v2
from tfhe_tpu.zk.pke import PrivateCommit, PublicCommit

D, K, B, Q, T, MSBS = 32, 2, 1 << 5, 0, 32, 1
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
    q_dec = 1 << 64 if Q == 0 else Q
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
    return (PublicCommit(a, b, c1, c2), PrivateCommit(r, e1, m, e2))


def test_four_squares():
    rng = random.Random(3)
    values = (list(range(128)) + [rng.randrange(1 << 90) for _ in range(20)]
              + [(1 << i) + 1 for i in range(8, 100, 7)])
    for v in values:
        s = pke_v2.four_squares(v)
        assert sum(x * x for x in s) == v
        assert all(x >= 0 for x in s)


def test_crs_params_cs_and_ghl():
    b_sq = pke_v2.inf_norm_bound_to_euclidean_squared(B, D + K)
    n_cs, big_d, bb_cs, m_cs = pke_v2.compute_crs_params(
        D, K, b_sq, T, MSBS, pke_v2.CS)
    n_ghl, big_d2, bb_ghl, m_ghl = pke_v2.compute_crs_params(
        D, K, b_sq, T, MSBS, pke_v2.GHL)
    assert big_d == big_d2 == D + K * 4  # t_eff = 16 -> 4 bits per message
    assert n_cs == big_d + 128 * m_cs
    inner = b_sq + ((D + 2) ** 2 * (D + K)) // 4
    assert bb_cs == (2 * (D + K) + 4) * inner
    assert bb_ghl == -(-950625 * inner // 10000)  # 9.75^2, fixed-point 1e4
    # GHL's constant factor beats Cauchy-Schwarz once 2(d+k)+4 > 95 (i.e. at
    # production dimensions); check that relation at a large-d evaluation too
    b_sq_big = pke_v2.inf_norm_bound_to_euclidean_squared(B, 2048 + K)
    _, _, bb_cs_big, m_cs_big = pke_v2.compute_crs_params(
        2048, K, b_sq_big, T, MSBS, pke_v2.CS)
    _, _, bb_ghl_big, m_ghl_big = pke_v2.compute_crs_params(
        2048, K, b_sq_big, T, MSBS, pke_v2.GHL)
    assert bb_ghl_big < bb_cs_big
    assert m_ghl_big <= m_cs_big


@pytest.fixture(scope="module")
def crs():
    return pke_v2.crs_gen(D, K, B, Q, T, MSBS, seed=0x2A)


@pytest.fixture(scope="module")
def case():
    return gen_testcase(random.Random(7))


def test_prove_verify_compute_load_proof(crs, case):
    pc, priv = case
    proof = pke_v2.prove(crs, pc, priv, metadata=b"meta", load="proof",
                         seed=b"s1")
    assert proof.c_hat_h3 is not None and proof.c_hat_w is not None
    assert pke_v2.verify(proof, crs, pc, metadata=b"meta")


def test_prove_verify_compute_load_verify(crs, case):
    pc, priv = case
    proof = pke_v2.prove(crs, pc, priv, metadata=b"meta", load="verify",
                         seed=b"s2")
    assert proof.c_hat_h3 is None
    assert pke_v2.verify(proof, crs, pc, metadata=b"meta")
    # Fiat-Shamir binds the metadata
    assert not pke_v2.verify(proof, crs, pc, metadata=b"other")
    # ... and the ciphertext
    bad = PublicCommit(pc.a, pc.b, pc.c1,
                       [center_mod_q(pc.c2[0] + 1, Q)] + pc.c2[1:])
    assert not pke_v2.verify(proof, crs, bad, metadata=b"meta")


def test_k_smaller_than_k_max(crs, case):
    pc, priv = case
    pc1 = PublicCommit(pc.a, pc.b, pc.c1, pc.c2[:1])
    priv1 = PrivateCommit(priv.r, priv.e1, priv.m[:1], priv.e2[:1])
    proof = pke_v2.prove(crs, pc1, priv1, metadata=b"m", load="proof",
                         seed=b"s6")
    assert pke_v2.verify(proof, crs, pc1, metadata=b"m")


def test_forged_oversized_noise_rejected(crs):
    """The verifier, not just the prover's precondition, enforces the norm
    bound: a forged proof over an out-of-bound witness fails the pairing
    checks."""
    rng = random.Random(8)
    pc, priv = gen_testcase(rng)
    priv.e1[0] += 40 * B
    c1 = [center_mod_q(x + e, Q)
          for x, e in zip(polymul_rev(pc.a, priv.r), priv.e1)]
    pc = PublicCommit(pc.a, pc.b, c1, pc.c2)
    with pytest.raises(AssertionError):
        pke_v2.prove(crs, pc, priv, metadata=b"m", load="verify", seed=b"s5")
    forged = pke_v2.prove(crs, pc, priv, metadata=b"m", load="verify",
                          seed=b"s5", _sanity_check=False)
    assert not pke_v2.verify(forged, crs, pc, metadata=b"m")


def test_proof_serialization_roundtrip(crs, case):
    from tfhe_tpu.utils.serialization import deserialize, serialize

    pc, priv = case
    proof = pke_v2.prove(crs, pc, priv, metadata=b"m", load="proof",
                         seed=b"s7")
    back = deserialize(serialize(proof))
    assert back == proof
    assert pke_v2.verify(back, crs, pc, metadata=b"m")
