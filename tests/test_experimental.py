"""Experimental core_crypto features (core/experimental.py vs the reference's
tfhe/src/core_crypto/experimental/): partial/shared keys, shrinking
keyswitch, pseudo-GGSW fast GLWE keyswitch, partial sample extraction, and
the extended PBS.  Toy parameters are noiseless so checks are exact."""

import jax.numpy as jnp
import numpy as np

from tfhe_tpu.core import experimental as exp
from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.encrypt import (
    decode,
    decrypt_glwe,
    decrypt_lwe,
    encode,
    encrypt_glwe_assign,
    encrypt_lwe,
)
from tfhe_tpu.core.entities import GlweSecretKey, LweCiphertext, LweSecretKey
from tfhe_tpu.core.params import TEST_VECTOR_TOY_PARAMS as TOY
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import server
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder,
    EncryptionRandomGenerator,
    SecretRandomGenerator,
)

SEED = 0xE4BE12
MSG_BITS = 4
DELTA = 1 << (64 - MSG_BITS - 1)


def _gens():
    sec = SecretRandomGenerator(SEED)
    enc = EncryptionRandomGenerator(SEED, DeterministicSeeder(SEED ^ 0x55))
    return sec, enc


def test_partial_glwe_secret_key():
    sec, _ = _gens()
    fill = 100
    sk = exp.generate_partial_binary_glwe_secret_key(2, 256, fill, sec)
    flat = sk.data.reshape(-1)
    assert np.all(flat[fill:] == 0)
    assert set(np.unique(flat[:fill])) <= {0, 1}
    assert flat[:fill].sum() > 0  # actually random, not all-zero


def test_shared_key_prefixes():
    sec, _ = _gens()
    large = kg.generate_binary_lwe_secret_key(64, sec)
    small = exp.generate_fully_shared_binary_lwe_secret_key(large, 24)
    assert np.array_equal(small.data, large.data[:24])
    glwe = kg.generate_binary_glwe_secret_key(2, 128, sec)
    shared = exp.generate_shared_glwe_secret_key_from_glwe_secret_key(
        glwe, 1, 128)
    assert np.array_equal(shared.data.reshape(-1),
                          glwe.data.reshape(-1)[:128])


def test_shrinking_keyswitch():
    sec, enc = _gens()
    large = kg.generate_binary_lwe_secret_key(40, sec)
    shared = 16
    small = exp.generate_fully_shared_binary_lwe_secret_key(large, shared)
    sksk = exp.generate_lwe_shrinking_keyswitch_key(
        large, shared, DecompParams(37, 1), TOY.lwe.noise, enc)
    assert sksk.ksk.data.shape == (40 - shared, 1, shared + 1)
    msgs = [0, 3, 7, 12, 15]
    cts = [encrypt_lwe(large, encode(m, MSG_BITS), TOY.lwe.noise, enc)
           for m in msgs]
    batch = jnp.asarray(np.stack([c.data for c in cts]))
    out = np.asarray(exp.shrinking_keyswitch(batch, sksk))
    for i, m in enumerate(msgs):
        assert decode(decrypt_lwe(small, LweCiphertext(out[i])),
                      MSG_BITS) == m


def test_glwe_fast_keyswitch():
    sec, enc = _gens()
    sk_in = kg.generate_binary_glwe_secret_key(1, 256, sec)
    sk_out = kg.generate_binary_glwe_secret_key(1, 256, sec)
    pg = exp.encrypt_pseudo_ggsw(sk_out, sk_in, DecompParams(24, 1),
                                 TOY.glwe.noise, enc)
    assert pg.data.shape == (1, 1, 2, 256)
    pg_mont, plan = exp.pseudo_ggsw_to_ntt(pg)
    msgs = np.arange(256) % 16
    body = (msgs.astype(np.uint64) << np.uint64(64 - MSG_BITS - 1))
    ct = encrypt_glwe_assign(sk_in, body, TOY.glwe.noise, enc)
    out = np.asarray(exp.glwe_fast_keyswitch(
        jnp.asarray(ct.data)[None], jnp.asarray(pg_mont), plan, 24, 1))[0]
    dec = decrypt_glwe(sk_out, type(ct)(out))
    got = [decode(int(v), MSG_BITS) for v in dec]
    assert got == list(msgs)


def test_partial_sample_extract_and_convert():
    sec, enc = _gens()
    phi = 300
    sk = exp.generate_partial_binary_glwe_secret_key(2, 256, phi, sec)
    shared_lwe = LweSecretKey(sk.data.reshape(-1)[:phi], 64)
    msgs = np.arange(256) % 16
    body = (msgs.astype(np.uint64) << np.uint64(64 - MSG_BITS - 1))
    ct = encrypt_glwe_assign(sk, body, TOY.glwe.noise, enc)
    lwe = np.asarray(exp.partial_extract_lwe_sample(
        jnp.asarray(ct.data)[None], 0, phi))[0]
    assert lwe.shape == (phi + 1,)
    assert decode(decrypt_lwe(shared_lwe, LweCiphertext(lwe)),
                  MSG_BITS) == msgs[0]
    # round-trip: embed back into a constant GLWE and decrypt coefficient 0
    glwe2 = np.asarray(exp.partial_convert_lwe_to_constant_glwe(
        jnp.asarray(lwe)[None], 2, 256))[0]
    dec = decrypt_glwe(sk, type(ct)(glwe2))
    assert decode(int(dec[0]), MSG_BITS) == msgs[0]


def _pbs_keyset():
    p = TOY
    sec, enc = _gens()
    glwe_sk = kg.generate_binary_glwe_secret_key(
        p.glwe_dimension, p.polynomial_size, sec)
    large_sk = glwe_sk.as_lwe_secret_key()
    small_sk = kg.generate_binary_lwe_secret_key(p.lwe_dimension, sec)
    bsk = kg.generate_lwe_bootstrap_key(small_sk, glwe_sk, p.pbs_decomp,
                                        p.glwe.noise, enc)
    bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)
    return p, large_sk, small_sk, enc, jnp.asarray(bsk_mont), plan


def test_extended_pbs_e1_matches_standard():
    """E=1 must reduce bit-exactly to the standard mono-LUT PBS."""
    p, large_sk, small_sk, enc, bsk_mont, plan = _pbs_keyset()
    msgs = [0, 2, 9, 15]
    cts = [encrypt_lwe(small_sk, encode(m, MSG_BITS), p.lwe.noise, enc)
           for m in msgs]
    batch = jnp.asarray(np.stack([c.data for c in cts]))
    f = lambda x: (3 * x + 2) % 16
    lut = server.generate_lut(p.polynomial_size, p.glwe_dimension + 1,
                              1 << MSG_BITS, DELTA, f)
    lut_b = jnp.broadcast_to(jnp.asarray(lut)[None],
                             (len(msgs),) + lut.shape)
    ext = np.asarray(exp.extended_pbs_batch(
        batch, lut_b, bsk_mont, plan, p.pbs_decomp.base_log,
        p.pbs_decomp.level_count, 1))
    std = np.asarray(server.pbs_from_switched_batch(
        server.modulus_switch(batch, int(2 * p.polynomial_size)
                              .bit_length() - 1),
        lut_b, bsk_mont, plan, p.pbs_decomp.base_log,
        p.pbs_decomp.level_count))
    assert np.array_equal(ext, std)


def test_extended_pbs_e4():
    """A 4x-extended LUT (size N*4) evaluated with the size-N BSK."""
    p, large_sk, small_sk, enc, bsk_mont, plan = _pbs_keyset()
    ext_factor = 4
    msgs = [0, 1, 5, 8, 11, 15]
    cts = [encrypt_lwe(small_sk, encode(m, MSG_BITS), p.lwe.noise, enc)
           for m in msgs]
    batch = jnp.asarray(np.stack([c.data for c in cts]))
    f = lambda x: (x * x + 3) % 16
    lut = server.generate_lut(p.polynomial_size * ext_factor,
                              p.glwe_dimension + 1, 1 << MSG_BITS, DELTA, f)
    lut_b = jnp.broadcast_to(jnp.asarray(lut)[None],
                             (len(msgs),) + lut.shape)
    out = np.asarray(exp.extended_pbs_batch(
        batch, lut_b, bsk_mont, plan, p.pbs_decomp.base_log,
        p.pbs_decomp.level_count, ext_factor))
    assert out.shape == (len(msgs),
                         p.glwe_dimension * p.polynomial_size + 1)
    for i, m in enumerate(msgs):
        res = decode(decrypt_lwe(large_sk, LweCiphertext(out[i])), MSG_BITS)
        assert res == f(m), (m, res, f(m))
