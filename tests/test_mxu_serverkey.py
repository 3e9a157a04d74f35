"""The ServerKey MXU route (ks_pbs_batch_mxu) end-to-end in interpret mode:
the exact production atomic pattern (KS-MXU -> MS -> fused v3/v4 kernel ->
sample extract) must decrypt correctly and match the v2 path's results.

On real TPU `ServerKey.use_mxu` selects this path automatically; CPU tests
drive it explicitly with interpret=True (shapes: TEST_PARAM 2_2, N=512)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.ops import mxu, server as srv
from tfhe_tpu.shortint import TEST_PARAM_MESSAGE_2_CARRY_2 as P
from tfhe_tpu.utils.keycache import get_shortint_keys


@pytest.fixture(scope="module")
def keys():
    return get_shortint_keys(P)


@pytest.mark.parametrize("kernel", ["v3", "v4"])
def test_atomic_pattern_mxu_decrypts(keys, kernel):
    ck, sk = keys
    assert sk._bsk_coeff is not None
    mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=4)
    m, _ = mxu.bsk_to_mxu(sk._bsk_coeff, mplan)
    if kernel == "v4":
        m = mxu.transpose_middle(m)
    lut = sk.generate_lookup_table(lambda x: (x * 5 + 1) % 16)
    msgs = [0, 1, 2, 3]
    cts = [ck.encrypt(v) for v in msgs]
    batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
    lut_b = jnp.asarray(np.broadcast_to(lut.acc, (4,) + lut.acc.shape))
    out = np.asarray(srv.ks_pbs_batch_mxu(
        batch, lut_b, sk.ksk, jnp.asarray(m), mplan,
        P.ks_base_log, P.ks_level, P.pbs_base_log, P.pbs_level,
        P.bits, False, 2, fold_mode="solinas", kernel=kernel,
        interpret=True))
    from tfhe_tpu.shortint.ciphertext import NOMINAL_NOISE, Ciphertext
    for i, v in enumerate(msgs):
        dec = ck.decrypt_raw(Ciphertext(out[i], 15, NOMINAL_NOISE,
                                        P.message_modulus, P.carry_modulus))
        assert dec == (v * 5 + 1) % 16


def test_three_prime_rounded_atomic_pattern(keys):
    """The production default (3-prime rounded-BSK solinas) decrypts."""
    ck, sk = keys
    mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=15)
    m, _ = mxu.bsk_to_mxu(sk._bsk_coeff, mplan)
    lut = sk.generate_lookup_table(lambda x: (x + 7) % 16)
    cts = [ck.encrypt(v) for v in (3, 2)]
    batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
    lut_b = jnp.asarray(np.broadcast_to(lut.acc, (2,) + lut.acc.shape))
    out = np.asarray(srv.ks_pbs_batch_mxu(
        batch, lut_b, sk.ksk, jnp.asarray(m), mplan,
        P.ks_base_log, P.ks_level, P.pbs_base_log, P.pbs_level,
        P.bits, False, 2, fold_mode="solinas", interpret=True))
    from tfhe_tpu.shortint.ciphertext import NOMINAL_NOISE, Ciphertext
    for i, v in enumerate((3, 2)):
        dec = ck.decrypt_raw(Ciphertext(out[i], 15, NOMINAL_NOISE,
                                        P.message_modulus, P.carry_modulus))
        assert dec == (v + 7) % 16


def test_atomic_pattern_v5_decrypts(keys):
    """The v5 byte-limb kernel through the full atomic pattern."""
    ck, sk = keys
    mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=15)
    m8, corr, _ = mxu.bsk_to_mxu_v5(sk._bsk_coeff, mplan)
    lut = sk.generate_lookup_table(lambda x: (x * 7 + 3) % 16)
    cts = [ck.encrypt(v) for v in (1, 3)]
    batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
    lut_b = jnp.asarray(np.broadcast_to(lut.acc, (2,) + lut.acc.shape))
    out = np.asarray(srv.ks_pbs_batch_mxu(
        batch, lut_b, sk.ksk, jnp.asarray(m8), mplan,
        P.ks_base_log, P.ks_level, P.pbs_base_log, P.pbs_level,
        P.bits, False, 2, kernel="v5", corr_mid=jnp.asarray(corr),
        interpret=True))
    from tfhe_tpu.shortint.ciphertext import NOMINAL_NOISE, Ciphertext
    for i, v in enumerate((1, 3)):
        dec = ck.decrypt_raw(Ciphertext(out[i], 15, NOMINAL_NOISE,
                                        P.message_modulus, P.carry_modulus))
        assert dec == (v * 7 + 3) % 16
