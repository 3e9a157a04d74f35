"""Noise squashing tests: u64 shortint -> exact u128 PBS -> decrypt under the
u128 key (shortint/noise_squashing/tests.rs analog, insecure fast params)."""

import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.ops import ntt
from tfhe_tpu.shortint.noise_squashing import (
    TEST_NOISE_SQUASHING_PARAM,
    NoiseSquashingKey,
    NoiseSquashingPrivateKey,
)
from tfhe_tpu.utils.keycache import get_shortint_keys


@pytest.fixture(scope="module")
def keys():
    ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
    sk = shortint.ServerKey(ck, seed=0x128)
    priv = NoiseSquashingPrivateKey(TEST_NOISE_SQUASHING_PARAM, seed=0x129)
    nsk = NoiseSquashingKey(ck, priv, seed=0x130)
    return ck, sk, priv, nsk


def test_squash_roundtrip(keys):
    ck, sk, priv, nsk = keys
    for msg in range(4):
        ct = ck.encrypt(msg)
        sq = nsk.squash_ciphertext_noise(ct, sk)
        dec = priv.decrypt_squashed_noise_ciphertext(sq)
        assert dec % 4 == msg, msg


def test_squash_preserves_carry_space(keys):
    """The identity LUT covers the whole msg*carry space."""
    ck, sk, priv, nsk = keys
    a = ck.encrypt(3)
    b = ck.encrypt(2)
    s = sk.unchecked_add(a, b)  # value 5 in the carry space
    sq = nsk.squash_ciphertext_noise(s, sk)
    assert priv.decrypt_squashed_noise_ciphertext(sq) == 5
    assert sq.degree == s.degree


def test_squash_batch(keys):
    ck, sk, priv, nsk = keys
    cts = [ck.encrypt(i % 4) for i in range(8)]
    out = nsk.squash_ciphertext_noise_batch(cts, sk)
    for i, sq in enumerate(out):
        assert priv.decrypt_squashed_noise_ciphertext(sq) == i % 4


def test_decompose128_exact():
    """Device u128 gadget decomposition against a Python-int model."""
    import jax.numpy as jnp

    from tfhe_tpu.ops.server128 import signed_decompose128

    rng = np.random.default_rng(3)
    vals = [int(x) | (int(y) << 64)
            for x, y in zip(rng.integers(0, 1 << 63, 32, dtype=np.uint64),
                            rng.integers(0, 1 << 63, 32, dtype=np.uint64))]
    lo = jnp.asarray(np.array([v & ((1 << 64) - 1) for v in vals], dtype=np.uint64))
    hi = jnp.asarray(np.array([v >> 64 for v in vals], dtype=np.uint64))
    base_log, levels = 24, 3
    digits = signed_decompose128(lo, hi, base_log, levels)
    # reconstruct: sum digit_l * 2^(128 - base_log*l) ~ closest representable
    M = 1 << 128
    rec = [0] * 32
    for idx, (d_lo, d_hi) in enumerate(digits):
        level = levels - idx  # digits returned level l first... check order
    # digits list is level l (least significant scale) first per decomposer.rs
    for i in range(32):
        total = 0
        for j, (d_lo, d_hi) in enumerate(digits):
            d = int(np.asarray(d_lo)[i]) | (int(np.asarray(d_hi)[i]) << 64)
            if d >= 1 << 127:
                d -= M
            level = levels - j
            total += d * (1 << (128 - base_log * level))
        total %= M
        # closest representable: |val - total| <= 2^(128 - base_log*levels - 1)
        err = (vals[i] - total) % M
        if err >= 1 << 127:
            err -= M
        assert abs(err) <= 1 << (128 - base_log * levels - 1), (i, err)


def test_hlapi_squash_radix():
    """FheUint8.squash_noise end-to-end through the public API."""
    import tfhe_tpu as t
    from tfhe_tpu.shortint.noise_squashing import TEST_NOISE_SQUASHING_PARAM

    cfg = (t.ConfigBuilder()
           .use_custom_parameters(shortint.TEST_PARAM_MESSAGE_2_CARRY_2)
           .enable_noise_squashing(TEST_NOISE_SQUASHING_PARAM)
           .build())
    ck, sk = t.generate_keys(cfg, seed=0x777)
    t.set_server_key(sk)
    a = t.FheUint8.encrypt(173, ck)
    b = t.FheUint8.encrypt(9, ck)
    s = a + b
    sq = s.squash_noise()
    assert ck.decrypt_squashed(sq) == (173 + 9) % 256


def test_squashed_compression(keys):
    """Pack squashed u128 LWEs into one GLWE and decrypt the list
    (noise_squashing_compression.rs analog)."""
    from tfhe_tpu.shortint.noise_squashing import (
        TEST_NOISE_SQUASHING_COMP_PARAM,
        NoiseSquashingCompressionKey,
        NoiseSquashingCompressionPrivateKey,
    )

    ck, sk, priv, nsk = keys
    comp_priv = NoiseSquashingCompressionPrivateKey(
        TEST_NOISE_SQUASHING_COMP_PARAM, seed=0x131)
    comp_key = NoiseSquashingCompressionKey(priv, comp_priv, seed=0x132)
    msgs = [3, 0, 2, 1, 2]
    sq = nsk.squash_ciphertext_noise_batch([ck.encrypt(m) for m in msgs], sk)
    packed = comp_key.compress(sq)
    assert comp_priv.decrypt_list(packed) == msgs
    # compression ratio: one GLWE vs count LWEs
    lwe_words = len(sq[0].lo) * len(msgs)
    glwe_words = packed.glwe_lo.size
    assert glwe_words < lwe_words


def test_squash_pallas_kernel_parity(keys):
    """ks_pbs128_batch through the fused quad-word kernel (interpret mode)
    is bit-identical to the XLA path on real squashing keys — the wiring
    NoiseSquashingKey uses on hardware."""
    import jax.numpy as jnp

    from tfhe_tpu.ops import server128

    ck, sk, priv, nsk = keys
    sp = nsk.params
    p = sk.params
    total = sp.total_modulus
    lut_lo, lut_hi = server128.generate_lut128(
        sp.polynomial_size, sp.glwe_dimension + 1, total, sp.delta128,
        lambda x: x)
    cts = [ck.encrypt(m % 4) for m in range(2)]
    batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
    l_lo = jnp.asarray(np.broadcast_to(lut_lo, (2,) + lut_lo.shape))
    l_hi = jnp.asarray(np.broadcast_to(lut_hi, (2,) + lut_hi.shape))
    args = (batch, l_lo, l_hi, sk.ksk, nsk.bsk128_mont, sk.plan, nsk.plan128,
            p.ks_base_log, p.ks_level, sp.decomp_base_log,
            sp.decomp_level_count)
    want_lo, want_hi = server128.ks_pbs128_batch(*args)
    got_lo, got_hi = server128.ks_pbs128_batch(
        *args, use_pallas=True, pallas_tb=2, pallas_interpret=True)
    assert np.array_equal(np.asarray(got_lo), np.asarray(want_lo))
    assert np.array_equal(np.asarray(got_hi), np.asarray(want_hi))
