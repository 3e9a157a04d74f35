"""CSPRNG statistical smoke tests (the dieharder-suite analog of
csprng_randomness_tests.yml, scaled to CI time): monobit, byte-value
chi-square, and serial-correlation checks on the AES-CTR stream."""

import numpy as np

from tfhe_tpu.utils.csprng import ByteStream


def _stream_bytes(n, seed=0xD1E4A2):
    return ByteStream(seed).take(n)


def test_monobit():
    raw = _stream_bytes(1 << 20)
    bits = np.unpackbits(raw)
    ones = int(bits.sum())
    n = bits.size
    # z-score of the one-count under fair coin; 6 sigma on 8M bits
    z = abs(ones - n / 2) / (0.5 * np.sqrt(n))
    assert z < 6.0, z


def test_byte_chi_square():
    raw = _stream_bytes(1 << 20)
    counts = np.bincount(raw, minlength=256)
    expected = raw.size / 256
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # 255 dof: mean 255, std ~22.6; allow 8 sigma
    assert abs(chi2 - 255) < 8 * 22.6, chi2


def test_serial_correlation():
    raw = _stream_bytes(1 << 20).astype(np.float64)
    x = raw - raw.mean()
    corr = float((x[:-1] * x[1:]).sum() / (x * x).sum())
    assert abs(corr) < 0.01, corr


def test_distinct_seeds_distinct_streams():
    a = ByteStream(1).take(4096)
    b = ByteStream(2).take(4096)
    assert not np.array_equal(a, b)
    # and deterministic per seed
    assert np.array_equal(a, ByteStream(1).take(4096))
