"""shortint layer tests with fast insecure parameters.

Model: shortint/server_key/tests/ — op results vs cleartext model, degree and
noise bookkeeping, smart-op bootstrap triggering.
"""

import pytest

from tfhe_tpu import shortint


@pytest.fixture(scope="module")
def keys():
    return shortint.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x5EED)


def test_encrypt_decrypt(keys):
    ck, sk = keys
    for m in range(4):
        assert ck.decrypt(ck.encrypt(m)) == m


def test_unchecked_add_and_carry(keys):
    ck, sk = keys
    a, b = ck.encrypt(3), ck.encrypt(2)
    s = sk.unchecked_add(a, b)
    assert ck.decrypt_raw(s) == 5  # carry visible in full space
    assert ck.decrypt(s) == 1      # message part
    assert s.degree == 6


def test_message_and_carry_extract(keys):
    ck, sk = keys
    a, b = ck.encrypt(3), ck.encrypt(3)
    s = sk.unchecked_add(a, b)
    msg = sk.message_extract(s)
    car = sk.carry_extract(s)
    assert ck.decrypt_raw(msg) == 2  # 6 % 4
    assert ck.decrypt_raw(car) == 1  # 6 // 4
    assert msg.noise_level == 1


def test_batched_lut_apply(keys):
    ck, sk = keys
    cts = [ck.encrypt(m) for m in [0, 1, 2, 3]]
    lut = sk.generate_lookup_table(lambda x: (3 * x + 2) % 16)
    outs = sk.apply_lookup_table_batch(cts, lut)
    for m, o in zip([0, 1, 2, 3], outs):
        assert ck.decrypt_raw(o) == (3 * m + 2) % 16


def test_scalar_ops(keys):
    ck, sk = keys
    a = ck.encrypt(2)
    assert ck.decrypt_raw(sk.unchecked_scalar_add(a, 3)) == 5
    assert ck.decrypt_raw(sk.unchecked_scalar_mul(a, 3)) == 6


def test_sub_and_neg(keys):
    ck, sk = keys
    a, b = ck.encrypt(1), ck.encrypt(3)
    d = sk.unchecked_sub(a, b)
    assert ck.decrypt(sk.message_extract(d)) == (1 - 3) % 4
    n = sk.unchecked_neg(b)
    assert ck.decrypt(sk.message_extract(n)) == (-3) % 4


def test_bivariate_ops(keys):
    ck, sk = keys
    for x, y in [(0, 0), (1, 3), (2, 2), (3, 1)]:
        a, b = ck.encrypt(x), ck.encrypt(y)
        assert ck.decrypt_raw(sk.mul(a, b)) == (x * y) % 4
        assert ck.decrypt_raw(sk.bitand(a, b)) == (x & y)
        assert ck.decrypt_raw(sk.bitxor(a, b)) == (x ^ y)
        assert ck.decrypt_raw(sk.eq(a, b)) == int(x == y)
        assert ck.decrypt_raw(sk.lt(a, b)) == int(x < y)


def test_smart_add_bootstraps_when_full(keys):
    ck, sk = keys
    a, b = ck.encrypt(3), ck.encrypt(3)
    acc = sk.unchecked_add(a, b)          # degree 6
    acc = sk.unchecked_add(acc, ck.encrypt(3))  # degree 9
    # smart_add must bootstrap (degree would exceed 15)
    out = sk.smart_add(acc, acc)
    assert ck.decrypt(sk.message_extract(out)) == (9 + 9) % 4 % 4
    assert out.degree <= sk.max_degree


def test_trivial(keys):
    ck, sk = keys
    t = sk.create_trivial(7)
    assert ck.decrypt_raw(t) == 7
    s = sk.unchecked_add(t, ck.encrypt(2))
    assert ck.decrypt_raw(s) == 9


def test_many_lookup_table(keys):
    """Several functions from ONE PBS (server_key/mod.rs:922 many-LUT)."""
    ck, sk = keys
    funcs = [lambda x: (x * 2) % 4, lambda x: (x + 1) % 4]
    mlut = sk.generate_many_lookup_table(funcs)
    for v in range(4):
        ct = ck.encrypt(v)
        outs = sk.apply_many_lookup_table(ct, mlut)
        assert len(outs) == 2
        assert ck.decrypt_raw(outs[0]) == (v * 2) % 4, v
        assert ck.decrypt_raw(outs[1]) == (v + 1) % 4, v


def test_many_lookup_table_degree_guard(keys):
    ck, sk = keys
    funcs = [lambda x: x] * 8  # max for total=16: budget degree = 1
    mlut = sk.generate_many_lookup_table(funcs)
    ct = ck.encrypt(3)  # degree 3 > budget 1
    import pytest as _pt

    with _pt.raises(AssertionError):
        sk.apply_many_lookup_table(ct, mlut)


def test_ks32_atomic_pattern():
    """KeySwitch32: u32 KSK, same LUT semantics
    (shortint/atomic_pattern/ks32.rs analog)."""
    import numpy as np

    from tfhe_tpu.shortint.params import TEST_PARAM_MESSAGE_2_CARRY_2_KS32

    ck, sk = shortint.gen_keys(TEST_PARAM_MESSAGE_2_CARRY_2_KS32, seed=0x32)
    assert np.asarray(sk.ksk).dtype == np.uint32  # half-width keyswitch key
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
    for v in range(4):
        out = sk.apply_lookup_table(ck.encrypt(v), lut)
        assert ck.decrypt_raw(out) == (v * 3 + 1) % 16, v
    # ops through the integer layer on the KS32 pattern
    from tfhe_tpu import integer

    ick, isk = integer.gen_keys(TEST_PARAM_MESSAGE_2_CARRY_2_KS32, seed=0x33)
    out = isk.add_parallelized(ick.encrypt_radix(150, 4), ick.encrypt_radix(90, 4))
    assert ick.decrypt_radix(out) == (150 + 90) % 256


def test_drift_ms_noise_reduction():
    """Drift-technique MS (modulus_switch_noise_reduction.rs:202): correct
    results and measurably smaller worst-case MS measure than no reduction."""
    import dataclasses

    import numpy as np

    from tfhe_tpu.shortint.params import MsNoiseReduction

    params = dataclasses.replace(
        shortint.TEST_PARAM_MESSAGE_2_CARRY_2,
        ms_noise_reduction=MsNoiseReduction.DRIFT, drift_zeros_count=16)
    ck, sk = shortint.gen_keys(params, seed=0xD21F7)
    assert sk.drift_zeros is not None and sk.drift_zeros.shape[0] == 16
    lut = sk.generate_lookup_table(lambda x: (x + 5) % 16)
    for v in range(4):
        out = sk.apply_lookup_table(ck.encrypt(v), lut)
        assert ck.decrypt_raw(out) == (v + 5) % 16, v


def test_modulus_switched_compression(keys):
    """CompressedModulusSwitchedCiphertext: KS+MS stored in log2(2N) bits per
    coefficient; decompression = blind rotate with any LUT."""
    ck, sk = keys
    lut = sk.generate_lookup_table(lambda x: (3 * x + 2) % 16)
    for m in (0, 1, 2, 3):
        comp = sk.switch_modulus_and_compress(ck.encrypt(m))
        # size check: packed stream is ~log2(2N)/64 of the raw ciphertext
        assert comp.packed.nbytes < (comp.count * 8) // 4
        out = sk.decompress_and_apply_lookup_table(comp, lut)
        assert ck.decrypt_raw(out) == (3 * m + 2) % 16, m
    # batched decompression
    comps = [sk.switch_modulus_and_compress(ck.encrypt(m)) for m in (3, 1)]
    outs = sk.decompress_and_apply_lookup_table_batch(comps, lut)
    assert [ck.decrypt_raw(o) for o in outs] == [(3 * 3 + 2) % 16, (3 * 1 + 2) % 16]


def test_checked_flavor(keys):
    """Four-flavor convention: checked_* errors instead of bootstrapping
    (server_key/add.rs:131 CheckError)."""
    from tfhe_tpu.shortint.server_key import CarryFullError

    ck, sk = keys
    a = ck.encrypt(3)
    b = ck.encrypt(2)
    out = sk.checked_add(a, b)
    assert ck.decrypt_raw(out) == 5
    # saturate the degree budget, then checked_add must refuse
    big = sk.unchecked_scalar_mul(a, 5)  # degree 15 = max
    try:
        sk.checked_add(big, b)
        assert False, "expected CarryFullError"
    except CarryFullError:
        pass
    out2 = sk.checked_mul(a, b)
    assert ck.decrypt_raw(out2) == (3 * 2) % 4  # mul_lsb semantics
    try:
        sk.checked_scalar_mul(a, 7)
        assert False, "expected CarryFullError"
    except CarryFullError:
        pass
