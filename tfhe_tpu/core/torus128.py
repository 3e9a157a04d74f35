"""u128 torus primitives for noise squashing (host side, numpy u64 pairs).

The reference's 128-bit path runs split-double f64 FFTs
(core_crypto/fft_impl/fft128/, algorithms/lwe_programmable_bootstrapping/
fft128_pbs.rs); here the same exact CRT-NTT engine covers the u128 torus
with 6 primes (185 bits > the 2^166 external-product bound), so the TPU
path is exact rather than 104-bit-mantissa approximate.

All u128 arrays are (lo, hi) u64 pairs; scalars are Python ints.
"""

from __future__ import annotations

import numpy as np

from ..ops import ntt
from ..utils.csprng import EncryptionRandomGenerator
from .params import DecompParams

M128 = 1 << 128
M64 = (1 << 64) - 1


def _split(x: int) -> tuple:
    x %= M128
    return np.uint64(x & M64), np.uint64(x >> 64)


def uniform_u128_pairs(stream, count: int):
    """`count` uniform u128 draws as (lo, hi) u64 arrays — 16 LE bytes per
    value, matching tfhe-csprng's u128 generation."""
    raw = stream.take(count * 16)
    words = raw.view("<u8")
    return words[0::2].copy(), words[1::2].copy()


def tuniform_pairs(dist, stream, count: int):
    """TUniform torus noise on u128: the u64 sample sign-extended to 128 bits."""
    vals = dist.sample(stream, count, 64)  # signed values wrapped in u64
    lo = vals
    hi = (vals.view(np.int64) >> np.int64(63)).view(np.uint64)
    return lo, hi


class GlweSecretKey128:
    """Binary GLWE key over the u128 torus (key bits are still 0/1)."""

    def __init__(self, data: np.ndarray):
        self.data = data  # (k, N) uint64 of 0/1

    @property
    def glwe_dimension(self) -> int:
        return self.data.shape[0]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[1]

    def to_lwe_key_bits(self) -> np.ndarray:
        """Flattened bits for sample-extracted LWE decryption."""
        return self.data.reshape(-1)


def generate_binary_glwe_secret_key128(k: int, n_poly: int, gen) -> GlweSecretKey128:
    return GlweSecretKey128(gen.binary_key(k * n_poly).reshape(k, n_poly))


def encrypt_glwe_assign128(sk: GlweSecretKey128, body_lo, body_hi,
                           noise_distribution, gen: EncryptionRandomGenerator,
                           plan) -> tuple:
    """GLWE-encrypt over u128 with a pre-filled body (GGSW row encryption).

    Returns ((k+1, N) lo, (k+1, N) hi).
    """
    k = sk.glwe_dimension
    n_poly = sk.polynomial_size
    m_lo, m_hi = uniform_u128_pairs(gen.mask, k * n_poly)
    m_lo = m_lo.reshape(k, n_poly)
    m_hi = m_hi.reshape(k, n_poly)
    e_lo, e_hi = tuniform_pairs(noise_distribution, gen.noise, n_poly)
    with np.errstate(over="ignore"):
        b_lo, b_hi = ntt.add128(body_lo, body_hi, e_lo, e_hi, np)
        for i in range(k):
            p_lo, p_hi = ntt.negacyclic_polymul_u128(
                m_lo[i], m_hi[i], sk.data[i], np.zeros(n_poly, np.uint64), plan, np)
            b_lo, b_hi = ntt.add128(b_lo, b_hi, p_lo, p_hi, np)
    lo = np.concatenate([m_lo, b_lo[None]], axis=0)
    hi = np.concatenate([m_hi, b_hi[None]], axis=0)
    return lo, hi


def generate_bootstrap_key128(input_sk, glwe_sk: GlweSecretKey128,
                              decomp: DecompParams, noise_distribution,
                              gen: EncryptionRandomGenerator, plan):
    """BSK over u128: GGSW(s_i) per input key bit, fork-tree identical in
    structure to the u64 BSK (lwe_bootstrap_key_generation.rs) with 16-byte
    mask elements.

    Returns (lo, hi) arrays of shape (n_in, l, k+1, k+1, N).
    """
    n_in = input_sk.dimension
    k = glwe_sk.glwe_dimension
    n_poly = glwe_sk.polynomial_size
    levels = decomp.level_count
    glwe_size = k + 1
    out_lo = np.zeros((n_in, levels, glwe_size, glwe_size, n_poly), dtype=np.uint64)
    out_hi = np.zeros_like(out_lo)
    ggsw_mask = levels * glwe_size * k * n_poly
    ggsw_noise = levels * glwe_size * n_poly
    ggsw_gens = gen.fork(n_in, ggsw_mask, ggsw_noise, noise_distribution, 128)
    for i in range(n_in):
        cleartext = int(input_sk.data[i])
        lev_gens = ggsw_gens[i].fork(levels, glwe_size * k * n_poly,
                                     glwe_size * n_poly, noise_distribution, 128)
        for j in range(levels):
            level = levels - j
            factor = ((-cleartext) % M128) * (1 << (128 - decomp.base_log * level)) % M128
            f_lo, f_hi = _split(factor)
            row_gens = lev_gens[j].fork(glwe_size, k * n_poly, n_poly,
                                        noise_distribution, 128)
            for r in range(glwe_size):
                body_lo = np.zeros(n_poly, dtype=np.uint64)
                body_hi = np.zeros(n_poly, dtype=np.uint64)
                if r < glwe_size - 1:
                    bits = glwe_sk.data[r]  # 0/1
                    body_lo = bits * f_lo
                    body_hi = bits * f_hi
                else:
                    neg = (-factor) % M128
                    body_lo[0], body_hi[0] = _split(neg)
                lo, hi = encrypt_glwe_assign128(glwe_sk, body_lo, body_hi,
                                                noise_distribution, row_gens[r], plan)
                out_lo[i, j, r], out_hi[i, j, r] = lo, hi
    return out_lo, out_hi


def bootstrap_key128_to_ntt(bsk_lo, bsk_hi, plan):
    """Residues + forward NTT + Montgomery form, per prime.

    Returns uint32 (n, l, k+1, k+1, P, N).
    """
    with np.errstate(over="ignore"):
        fwd = ntt.forward_all_u128(bsk_lo, bsk_hi, plan, np)
        mont = ntt.to_mont_all(fwd, plan, np)
    return mont.astype(np.uint32)


def decrypt_lwe128(key_bits: np.ndarray, ct_lo: np.ndarray, ct_hi: np.ndarray) -> int:
    """b - <a, s> mod 2^128 (exact, Python ints)."""
    n = len(key_bits)
    acc = 0
    for i in range(n):
        if key_bits[i]:
            acc += int(ct_lo[i]) | (int(ct_hi[i]) << 64)
    body = int(ct_lo[n]) | (int(ct_hi[n]) << 64)
    return (body - acc) % M128


def decode128(plaintext: int, msg_bits: int) -> int:
    """Round to the top (msg_bits+1) bits of the u128 torus."""
    shift = 128 - msg_bits - 1
    rounded = ((plaintext >> (shift - 1)) + 1) >> 1
    return rounded % (1 << msg_bits)
