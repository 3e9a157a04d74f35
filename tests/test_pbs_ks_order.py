"""PBS->KS atomic-pattern ordering (PBSOrder::BootstrapKeyswitch,
shortint/parameters/mod.rs:73 + atomic_pattern/standard.rs:153 — round-2
VERDICT missing item #4): small-key ciphertexts bootstrap FIRST, then
keyswitch back down.  Covers shortint LUT apply and an integer add."""

import numpy as np
import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.params import (
    EncryptionKeyChoice, TEST_PARAM_MESSAGE_2_CARRY_2_PBS_KS,
    V1_4_PARAM_MESSAGE_2_CARRY_2_PBS_KS_GAUSSIAN_2M128,
)
from tfhe_tpu.shortint.server_key import ServerKey


@pytest.fixture(scope="module")
def keys():
    p = TEST_PARAM_MESSAGE_2_CARRY_2_PBS_KS
    ck = ClientKey(p, seed=0xAB5)
    return ck, ServerKey(ck, seed=0xAB5)


def test_params_small_key():
    p = V1_4_PARAM_MESSAGE_2_CARRY_2_PBS_KS_GAUSSIAN_2M128
    assert p.encryption_key_choice == EncryptionKeyChoice.SMALL
    assert (p.lwe_dimension, p.ks_base_log, p.ks_level) == (978, 3, 6)


def test_small_key_ciphertext_width(keys):
    ck, _ = keys
    ct = ck.encrypt(3)
    # small-key ciphertexts have n_small+1 coefficients, not k*N+1
    assert ct.data.shape[-1] == ck.params.lwe_dimension + 1
    assert ck.decrypt_raw(ct) == 3


def test_pbs_ks_lut_apply(keys):
    ck, sk = keys
    cts = [ck.encrypt(v) for v in (0, 1, 2, 3)]
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
    outs = sk.apply_lookup_table_batch(cts, lut)
    assert [ck.decrypt_raw(o) for o in outs] == [1, 4, 7, 10]
    # output is back under the small key
    assert np.asarray(outs[0].data).shape[-1] == ck.params.lwe_dimension + 1


def test_pbs_ks_integer_add():
    ck, sk = integer.gen_keys(TEST_PARAM_MESSAGE_2_CARRY_2_PBS_KS, seed=0x1B)
    a = ck.encrypt_radix(141, 4)
    b = ck.encrypt_radix(93, 4)
    assert ck.decrypt_radix(sk.add_parallelized(a, b)) == (141 + 93) % 256
