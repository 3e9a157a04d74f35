"""Seeded (compressed) entities: store bodies + a 128-bit seed; the public
mask halves regenerate from the seed's AES-CTR stream on decompression.

Mirrors core_crypto/entities/seeded_* (SeededLweCiphertext(List),
SeededLweKeyswitchKey, SeededLweBootstrapKey, seeded_*_decompression.rs):
compression factor (n+1) -> 1 for LWE, (k+1) -> 1 for GLWE rows.  The mask
is pure public randomness — decompression replays the generation-time fork
tree over the mask byte stream only; stored bodies already contain
mask·s + message + noise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.csprng import ByteStream
from .params import DecompParams


def _mask_u64(stream: ByteStream, count: int, bits: int = 64) -> np.ndarray:
    return stream.uniform_scalar(count, bits)


# ---------------------------------------------------------------------------
# Seeded LWE ciphertext list
# ---------------------------------------------------------------------------


@dataclass
class SeededLweCiphertextList:
    """bodies: (count,) u64; masks regenerate from seed (one n-element draw
    per ciphertext, in order)."""

    seed: int
    bodies: np.ndarray
    lwe_dimension: int
    bits: int = 64

    def decompress(self) -> np.ndarray:
        """Returns (count, n+1) u64 full ciphertexts."""
        stream = ByteStream(self.seed)
        count = len(self.bodies)
        n = self.lwe_dimension
        out = np.empty((count, n + 1), dtype=np.uint64)
        for i in range(count):
            out[i, :n] = _mask_u64(stream, n, self.bits)
            out[i, n] = self.bodies[i]
        return out


def seed_encrypt_lwe_list(sk, encoded: list, noise_distribution, seeder,
                          noise_stream: ByteStream, bits: int = 64) -> SeededLweCiphertextList:
    """Encrypt a list with a fresh mask seed; store bodies only
    (lwe_encryption.rs seeded variants)."""
    seed = seeder.seed()
    mask_stream = ByteStream(seed)
    n = sk.dimension
    skd = sk.data.astype(np.uint64)
    bodies = np.empty(len(encoded), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, m in enumerate(encoded):
            mask = _mask_u64(mask_stream, n, bits)
            e = int(noise_distribution.sample(noise_stream, 1, bits)[0])
            bodies[i] = (np.sum(mask * skd, dtype=np.uint64)
                         + np.uint64(m % (1 << bits)) + np.uint64(e % (1 << bits)))
    return SeededLweCiphertextList(seed, bodies, n, bits)


# ---------------------------------------------------------------------------
# Seeded keyswitch key
# ---------------------------------------------------------------------------


@dataclass
class SeededLweKeyswitchKey:
    seed: int
    bodies: np.ndarray  # (n_in, levels)
    input_dimension: int
    output_dimension: int
    decomp: DecompParams
    bits: int = 64

    def decompress(self) -> np.ndarray:
        """(n_in, levels, n_out+1) u64 — mask layout replays the generation
        fork tree (one fork of `levels` children per input element)."""
        stream = ByteStream(self.seed)
        n_in, levels = self.bodies.shape
        n_out = self.output_dimension
        out = np.empty((n_in, levels, n_out + 1), dtype=np.uint64)
        for i in range(n_in):
            children = stream.fork(levels, n_out * (self.bits // 8))
            for j in range(levels):
                out[i, j, :n_out] = _mask_u64(children[j], n_out, self.bits)
                out[i, j, n_out] = self.bodies[i, j]
        return out


def seed_generate_lwe_keyswitch_key(input_sk, output_sk, decomp: DecompParams,
                                    noise_distribution, seeder, noise_stream,
                                    bits: int = 64) -> SeededLweKeyswitchKey:
    seed = seeder.seed()
    mask_stream = ByteStream(seed)
    n_in = input_sk.dimension
    n_out = output_sk.dimension
    levels = decomp.level_count
    skd = output_sk.data.astype(np.uint64)
    bodies = np.empty((n_in, levels), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n_in):
            key_elem = int(input_sk.data[i])
            children = mask_stream.fork(levels, n_out * (bits // 8))
            for j in range(levels):
                level = levels - j
                encoded = (key_elem << (bits - decomp.base_log * level)) % (1 << bits)
                mask = _mask_u64(children[j], n_out, bits)
                e = int(noise_distribution.sample(noise_stream, 1, bits)[0])
                bodies[i, j] = (np.sum(mask * skd, dtype=np.uint64)
                                + np.uint64(encoded) + np.uint64(e % (1 << bits)))
    return SeededLweKeyswitchKey(seed, bodies, n_in, n_out, decomp, bits)


# ---------------------------------------------------------------------------
# Seeded bootstrap key
# ---------------------------------------------------------------------------


@dataclass
class SeededLweBootstrapKey:
    """bodies: (n_in, levels, k+1, N) — the body polynomial of every GLWE row;
    the k mask polynomials per row regenerate from the seed."""

    seed: int
    bodies: np.ndarray
    glwe_dimension: int
    polynomial_size: int
    decomp: DecompParams
    bits: int = 64
    # masks floored to multiples of 2^rb on decompression (the bodies were
    # adjusted at generation time by ops/mxu.mask_floor_bsk semantics, so
    # the regenerated key IS the floored key — see shortint/compressed_key)
    mask_floor_rb: int = 0

    def decompress(self) -> np.ndarray:
        """(n_in, levels, k+1, k+1, N) u64 standard-domain BSK."""
        stream = ByteStream(self.seed)
        n_in, levels, glwe_size, n_poly = self.bodies.shape
        k = self.glwe_dimension
        out = np.empty((n_in, levels, glwe_size, glwe_size, n_poly), dtype=np.uint64)
        bpc_row = k * n_poly * (self.bits // 8)
        ggsw_gens = stream.fork(n_in, levels * glwe_size * bpc_row)
        for i in range(n_in):
            lev_gens = ggsw_gens[i].fork(levels, glwe_size * bpc_row)
            for j in range(levels):
                row_gens = lev_gens[j].fork(glwe_size, bpc_row)
                for r in range(glwe_size):
                    mask = _mask_u64(row_gens[r], k * n_poly, self.bits)
                    if self.mask_floor_rb:
                        mask = mask & ~np.uint64(
                            (1 << self.mask_floor_rb) - 1)
                    out[i, j, r, :k] = mask.reshape(k, n_poly)
                    out[i, j, r, k] = self.bodies[i, j, r]
        return out


def seed_generate_lwe_bootstrap_key(input_sk, glwe_sk, decomp: DecompParams,
                                    noise_distribution, seeder, noise_stream,
                                    bits: int = 64) -> SeededLweBootstrapKey:
    """Same math as keygen.generate_lwe_bootstrap_key with the mask drawn
    from a recorded seed; stores row bodies only."""
    from ..ops import ntt
    from .keygen import _ggsw_factor

    seed = seeder.seed()
    mask_stream = ByteStream(seed)
    n_in = input_sk.dimension
    k = glwe_sk.glwe_dimension
    n_poly = glwe_sk.polynomial_size
    levels = decomp.level_count
    glwe_size = k + 1
    plan = ntt.make_plan(n_poly)
    bodies = np.empty((n_in, levels, glwe_size, n_poly), dtype=np.uint64)
    bpc_row = k * n_poly * (bits // 8)
    ggsw_gens = mask_stream.fork(n_in, levels * glwe_size * bpc_row)
    with np.errstate(over="ignore"):
        for i in range(n_in):
            cleartext = int(input_sk.data[i])
            lev_gens = ggsw_gens[i].fork(levels, glwe_size * bpc_row)
            for j in range(levels):
                level = levels - j
                factor = _ggsw_factor(cleartext, level, decomp.base_log, bits)
                row_gens = lev_gens[j].fork(glwe_size, bpc_row)
                for r in range(glwe_size):
                    body = np.zeros(n_poly, dtype=np.uint64)
                    if r < glwe_size - 1:
                        body = glwe_sk.data[r].astype(np.uint64) * np.uint64(factor % (1 << 64))
                        if bits == 32:
                            body = body & np.uint64(0xFFFFFFFF)
                    else:
                        body[0] = (-factor) % (1 << bits)
                    mask = _mask_u64(row_gens[r], k * n_poly, bits).reshape(k, n_poly)
                    noise = noise_distribution.sample(noise_stream, n_poly, bits)
                    body = body + noise.astype(np.uint64)
                    for t in range(k):
                        prod = ntt.negacyclic_polymul_u64(
                            mask[t], glwe_sk.data[t].astype(np.uint64), plan, np)
                        body = body + prod
                    bodies[i, j, r] = body
    return SeededLweBootstrapKey(seed, bodies, k, n_poly, decomp, bits)
