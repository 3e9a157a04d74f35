"""Common-mask (CM) ciphertexts and algorithms (core/cm.py vs the reference's
tfhe/src/core_crypto/experimental/{entities,algorithms}/common_mask_*).
Toy parameters are noiseless so every check is exact."""

import jax.numpy as jnp
import numpy as np

from tfhe_tpu.core import cm
from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.encrypt import decode, encode
from tfhe_tpu.core.params import TEST_VECTOR_TOY_PARAMS as TOY
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import server
from tfhe_tpu.utils.csprng import (
    DeterministicSeeder,
    EncryptionRandomGenerator,
    SecretRandomGenerator,
)

SEED = 0xC0FFEE
MSG_BITS = 4
DELTA = 1 << (64 - MSG_BITS - 1)
C = 2  # cm_dimension (slots)


def _gens():
    sec = SecretRandomGenerator(SEED)
    enc = EncryptionRandomGenerator(SEED, DeterministicSeeder(SEED ^ 0x99))
    return sec, enc


def _lwe_keys(sec, n, count=C):
    return [kg.generate_binary_lwe_secret_key(n, sec) for _ in range(count)]


def _glwe_keys(sec, k, n_poly, count=C):
    return [kg.generate_binary_glwe_secret_key(k, n_poly, sec)
            for _ in range(count)]


def test_cm_lwe_roundtrip_and_linear_algebra():
    sec, enc = _gens()
    sks = _lwe_keys(sec, TOY.lwe_dimension)
    msgs = [4, 3]
    ct = cm.encrypt_cm_lwe(sks, [encode(m, MSG_BITS) for m in msgs],
                           TOY.lwe.noise, enc)
    # shared mask, one body per slot
    assert ct.shape == (TOY.lwe_dimension + C,)
    dec = cm.decrypt_cm_lwe(sks, ct)
    assert [decode(d, MSG_BITS) for d in dec] == msgs

    ct2 = cm.encrypt_cm_lwe(sks, [encode(m, MSG_BITS) for m in [1, 5]],
                            TOY.lwe.noise, enc)
    with np.errstate(over="ignore"):
        s = cm.cm_lwe_add(ct, ct2)
        m3 = cm.cm_lwe_scalar_mul(ct2, 3)
    assert [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(sks, s)] == [5, 8]
    assert [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(sks, m3)] == [3, 15]


def test_cm_keyswitch():
    sec, enc = _gens()
    big = _lwe_keys(sec, TOY.glwe_dimension * TOY.polynomial_size)
    small = _lwe_keys(sec, TOY.lwe_dimension)
    cksk = cm.generate_cm_lwe_keyswitch_key(big, small, TOY.ks_decomp,
                                            TOY.lwe.noise, enc)
    msgs = [[7, 2], [0, 15], [9, 9]]
    cts = np.stack([
        cm.encrypt_cm_lwe(big, [encode(m, MSG_BITS) for m in row],
                          TOY.lwe.noise, enc) for row in msgs
    ])
    out = np.asarray(cm.cm_keyswitch(jnp.asarray(cts), cksk))
    for row, exp in zip(out, msgs):
        got = [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(small, row)]
        assert got == exp


def test_cm_glwe_roundtrip():
    sec, enc = _gens()
    sks = _glwe_keys(sec, TOY.glwe_dimension, TOY.polynomial_size)
    rng = np.random.default_rng(5)
    body = (rng.integers(0, 16, size=(C, TOY.polynomial_size)).astype(np.uint64)
            * np.uint64(DELTA))
    ct = cm.encrypt_cm_glwe(sks, body, TOY.glwe.noise, enc)
    assert ct.shape == (TOY.glwe_dimension + C, TOY.polynomial_size)
    dec = cm.decrypt_cm_glwe(sks, ct)
    assert np.array_equal(dec, body)


def test_cm_ggsw_cmux_selects_per_slot():
    """GGSW cleartexts [0, 1]: slot 0 keeps ct0's plaintext, slot 1 takes
    ct1's — ONE CMux drives both slots (cm_ggsw_external_product.rs:184)."""
    sec, enc = _gens()
    sks = _glwe_keys(sec, TOY.glwe_dimension, TOY.polynomial_size)
    decomp = DecompParams(24, 1)
    ggsw = cm.encrypt_cm_ggsw(sks, [0, 1], decomp, TOY.glwe.noise, enc)
    ggsw_mont, plan = cm.cm_ggsw_to_ntt(ggsw)

    n = TOY.polynomial_size
    p0 = np.full((C, n), 3, dtype=np.uint64) * np.uint64(DELTA)
    p1 = np.full((C, n), 12, dtype=np.uint64) * np.uint64(DELTA)
    ct0 = cm.encrypt_cm_glwe(sks, p0, TOY.glwe.noise, enc)
    ct1 = cm.encrypt_cm_glwe(sks, p1, TOY.glwe.noise, enc)
    out = cm.cm_cmux(jnp.asarray(ct0)[None], jnp.asarray(ct1)[None],
                     jnp.asarray(ggsw_mont), plan, decomp.base_log,
                     decomp.level_count)
    dec = cm.decrypt_cm_glwe(sks, np.asarray(out)[0])
    with np.errstate(over="ignore"):
        got = ((dec + np.uint64(DELTA // 2)) >> np.uint64(64 - MSG_BITS - 1)
               ).astype(np.int64) % (1 << MSG_BITS)
    assert np.all(got[0] == 3), "slot 0 must keep ct0"
    assert np.all(got[1] == 12), "slot 1 must select ct1"


def test_cm_bootstrap_end_to_end():
    """Encrypt C messages with ONE shared mask, run ONE blind rotation, and
    recover both slots' LUT outputs (cm_bootstrap.rs:75-171)."""
    sec, enc = _gens()
    in_sks = _lwe_keys(sec, TOY.lwe_dimension)
    glwe_sks = _glwe_keys(sec, TOY.glwe_dimension, TOY.polynomial_size)
    flat_sks = [sk.as_lwe_secret_key() for sk in glwe_sks]
    bsk = cm.generate_cm_lwe_bootstrap_key(in_sks, glwe_sks, TOY.pbs_decomp,
                                           TOY.glwe.noise, enc)
    assert bsk.shape == (TOY.lwe_dimension, TOY.pbs_decomp.level_count,
                         TOY.glwe_dimension + C, TOY.glwe_dimension + C,
                         TOY.polynomial_size)
    bsk_mont, plan = cm.cm_bootstrap_key_to_ntt(bsk)

    f = lambda x: (3 * x + 1) % (1 << MSG_BITS)
    lut = server.generate_lut(TOY.polynomial_size, TOY.glwe_dimension + 1,
                              1 << MSG_BITS, DELTA, f)[-1]
    msgs = [[4, 11], [0, 7], [15, 1]]
    cts = np.stack([
        cm.encrypt_cm_lwe(in_sks, [encode(m, MSG_BITS) for m in row],
                          TOY.lwe.noise, enc) for row in msgs
    ])
    out = np.asarray(cm.cm_bootstrap(jnp.asarray(cts), lut, bsk_mont, plan,
                                     TOY.pbs_decomp.base_log,
                                     TOY.pbs_decomp.level_count,
                                     TOY.glwe_dimension))
    assert out.shape == (len(msgs),
                         TOY.glwe_dimension * TOY.polynomial_size + C)
    for row, inp in zip(out, msgs):
        got = [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(flat_sks, row)]
        assert got == [f(m) for m in inp], (inp, got)


def test_cm_packing():
    """C standard LWEs under one key -> one CmLwe, message i in slot i
    (cm_lwe_packing.rs:12)."""
    from tfhe_tpu.core.encrypt import encrypt_lwe

    sec, enc = _gens()
    in_sk = kg.generate_binary_lwe_secret_key(TOY.lwe_dimension, sec)
    out_sks = _lwe_keys(sec, TOY.lwe_dimension)
    pk = cm.generate_cm_lwe_packing_key(in_sk, out_sks, TOY.ks_decomp,
                                        TOY.lwe.noise, enc)
    msgs = [[6, 13], [2, 2]]
    cts = np.stack([
        np.stack([encrypt_lwe(in_sk, encode(m, MSG_BITS), TOY.lwe.noise,
                              enc).data for m in row])
        for row in msgs
    ])
    out = np.asarray(cm.pack_lwe_ciphertexts_into_cm(jnp.asarray(cts), pk))
    for row, exp in zip(out, msgs):
        got = [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(out_sks, row)]
        assert got == exp


def test_cm_drift_ms_noise_reduction():
    """The chosen candidate still decrypts correctly in every slot and the
    measure is computed over the shared mask only
    (cm_modulus_switch_noise_reduction.rs:14-107)."""
    sec, enc = _gens()
    sks = _lwe_keys(sec, TOY.lwe_dimension)
    msgs = [9, 6]
    ct = cm.encrypt_cm_lwe(sks, [encode(m, MSG_BITS) for m in msgs],
                           TOY.lwe.noise, enc)
    zeros = np.stack([
        cm.encrypt_cm_lwe(sks, [0] * C, TOY.lwe.noise, enc) for _ in range(4)
    ])
    log_mod = int(2 * TOY.polynomial_size).bit_length() - 1
    out = np.asarray(cm.cm_drift_ms_improve(
        jnp.asarray(ct)[None], jnp.asarray(zeros), log_mod,
        r_sigma=3.0, input_variance_mod=0.0, c_dim=C))[0]
    got = [decode(d, MSG_BITS) for d in cm.decrypt_cm_lwe(sks, out)]
    assert got == msgs
    # output is ct + one of {0, zeros[i]}
    with np.errstate(over="ignore"):
        diffs = [out - ct] + [out - ct - z for z in zeros]
    assert any(np.all(d == 0) for d in diffs)
