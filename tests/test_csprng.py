"""CSPRNG tests: AES correctness (FIPS-197), CTR layout, fork semantics."""

import numpy as np

from tfhe_tpu.utils.csprng import (
    ByteStream,
    DeterministicSeeder,
    EncryptionRandomGenerator,
    Gaussian,
    TUniform,
    _aes_ecb,
)


def test_aes_fips197():
    # FIPS publication 197 known-answer test (same vector the reference's
    # soft block cipher uses in its tests).
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = np.frombuffer(bytes.fromhex("00112233445566778899aabbccddeeff"), dtype=np.uint8)
    ct = _aes_ecb(key, pt.reshape(1, 16))
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_stream_deterministic_and_contiguous():
    s1 = ByteStream(0x74666865)
    a = s1.take(40)
    s2 = ByteStream(0x74666865)
    b1 = s2.take(13)
    b2 = s2.take(27)
    assert np.array_equal(a, np.concatenate([b1, b2]))


def test_counter_is_le128_of_block_index():
    # byte at pos p must equal AES(key, LE128(p//16))[p%16]
    s = ByteStream(12345)
    raw = s.take(64)
    blocks = _aes_ecb((12345).to_bytes(16, "little"),
                      np.concatenate([np.frombuffer(int(i).to_bytes(16, "little"), dtype=np.uint8).reshape(1, 16)
                                      for i in range(4)]))
    assert np.array_equal(raw, blocks.reshape(-1))


def test_fork_partitions_stream():
    parent = ByteStream(42)
    flat = ByteStream(42).take(300)
    children = parent.fork(3, 100)
    for i, c in enumerate(children):
        assert np.array_equal(c.take(100), flat[i * 100 : (i + 1) * 100])
    # parent continues after the fork region
    after = parent.take(16)
    assert np.array_equal(after, ByteStream(42, pos=300).take(16))


def test_fork_window_enforced():
    parent = ByteStream(7)
    (child,) = parent.fork(1, 10)
    child.take(10)
    try:
        child.take(1)
        assert False, "expected overrun error"
    except RuntimeError:
        pass


def test_nested_fork_matches_flat():
    flat = ByteStream(99).take(1000)
    parent = ByteStream(99)
    kids = parent.fork(2, 500)
    grandkids = kids[1].fork(5, 100)
    assert np.array_equal(grandkids[2].take(100), flat[500 + 200 : 500 + 300])


def test_tuniform_bounds_and_parity():
    s = ByteStream(1)
    b = 17
    vals = s.tuniform(10000, b, 64).astype(np.int64)
    assert vals.min() >= -(1 << b)
    assert vals.max() <= (1 << b)
    # rough uniformity: mean near 0 within 4 sigma
    std = np.sqrt((2.0 ** (2 * b + 1) + 1) / 6)
    assert abs(vals.mean()) < 4 * std / np.sqrt(10000)


def test_gaussian_moments_and_stream_advance():
    s = ByteStream(3)
    std_torus = 2.0 ** -25
    vals = s.gaussian_torus(20000, std_torus, 0.0, 64).astype(np.int64).astype(np.float64)
    measured_std = vals.std() * 2.0 ** -64
    assert 0.97 * std_torus < measured_std < 1.03 * std_torus
    # stream advanced by a whole number of 16-byte chunks
    assert s.pos % 16 == 0


def test_gaussian_sequential_equals_batched():
    # sample-by-sample consumption must equal batched consumption
    s1 = ByteStream(5)
    batched = s1.gaussian_torus(50, 2.0 ** -20, 0.0, 64)
    s2 = ByteStream(5)
    seq = np.concatenate([s2.gaussian_torus(1, 2.0 ** -20, 0.0, 64) for _ in range(50)])
    assert np.array_equal(batched, seq)
    assert s1.pos == s2.pos


def test_deterministic_seeder():
    seeder = DeterministicSeeder(0xABCDEF)
    s1 = seeder.seed()
    s2 = seeder.seed()
    ref = ByteStream(0xABCDEF)
    assert s1 == int.from_bytes(ref.take(16).tobytes(), "little")
    assert s2 == int.from_bytes(ref.take(16).tobytes(), "little")


def test_encryption_generator_fork():
    gen = EncryptionRandomGenerator(123, DeterministicSeeder(123))
    noise_seed = DeterministicSeeder(123).seed()
    children = gen.fork(2, mask_elements=10, noise_elements=3,
                        noise_distribution=TUniform(17), bits=64)
    # child 0 mask = first 80 bytes of mask stream
    assert np.array_equal(children[0].mask.take(80), ByteStream(123).take(80))
    # child 1 noise window starts at 3*3 bytes (TUniform(17) -> 3 bytes/sample)
    assert children[1].noise.pos == 9
    assert children[1].noise.key_bytes == noise_seed.to_bytes(16, "little")


def test_gaussian_fork_budget():
    g = Gaussian(std=2.0 ** -20)
    assert g.sample_bytes(64) == 16 * 58  # ceil(-128/log2(1-pi/4)) attempts
