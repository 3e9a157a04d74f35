"""Ciphertext list compression: pack <= N LWEs into GLWEs via packing
keyswitch (shortint/list_compression/compression.rs:17-60).

TPU-first simplifications for this round:
  - packing happens under the compute GLWE key (the reference supports
    dedicated compression parameters / keys), so decompression is a plain
    (exact) sample extract — no decompression bootstrap is needed;
  - storage keeps full-precision u64 coefficients (the reference additionally
    modulus-switches the stored GLWE; storage-MS lands with serialization).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.encrypt import encrypt_glwe_assign
from ..ops import ntt, server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator
from .ciphertext import NOMINAL_NOISE, Ciphertext
from .client_key import ClientKey


@dataclass
class CompressedCiphertextList:
    glwes: np.ndarray  # (G, k+1, N) u64
    count: int
    degrees: list
    message_modulus: int
    carry_modulus: int


class CompressionKey:
    """Packing keyswitch key: big LWE key -> compute GLWE key."""

    def __init__(self, client_key: ClientKey, seed: int | None = None):
        p = client_key.params
        self.params = p
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed ^ 0x452821E638D01377,
                                        DeterministicSeeder(seed ^ 0xBE5466CF34E90C6C))
        glwe_sk = client_key.glwe_secret_key
        big_sk = client_key.big_lwe_secret_key
        n_big = big_sk.dimension
        levels = p.ks_level
        base_log = p.ks_base_log
        n_poly = p.polynomial_size
        k1 = p.glwe_dimension + 1
        pksk = np.zeros((n_big, levels, k1, n_poly), dtype=np.uint64)
        for i in range(n_big):
            s_i = int(big_sk.data[i])
            for j in range(levels):
                level = levels - j
                body = np.zeros(n_poly, dtype=np.uint64)
                body[0] = np.uint64((s_i << (p.bits - base_log * level)) % (1 << p.bits))
                ct = encrypt_glwe_assign(glwe_sk, body, p.glwe_noise, gen, p.bits)
                pksk[i, j] = ct.data
        plan = ntt.make_plan(n_poly, 4)
        fwd = ntt.forward_all(pksk, plan, np)
        self.pksk_mont = jnp.asarray(ntt.to_mont_all(fwd, plan, np).astype(np.uint32))
        self.plan = plan

    def compress(self, cts: list) -> CompressedCiphertextList:
        p = self.params
        n_poly = p.polynomial_size
        glwes = []
        for start in range(0, len(cts), n_poly):
            chunk = cts[start : start + n_poly]
            batch = jnp.asarray(np.stack([np.asarray(c.data) for c in chunk]))
            glwe = srv.packing_keyswitch(batch, self.pksk_mont, self.plan,
                                         p.ks_base_log, p.ks_level, p.bits)
            glwes.append(np.asarray(glwe))
        first = cts[0]
        return CompressedCiphertextList(
            np.stack(glwes), len(cts), [c.degree for c in cts],
            first.message_modulus, first.carry_modulus,
        )


def decompress(packed: CompressedCiphertextList, indices=None) -> list:
    """Extract LWEs back out of the packed GLWEs (exact sample extract)."""
    import jax

    n_poly = packed.glwes.shape[-1]
    indices = range(packed.count) if indices is None else indices
    out = []
    for idx in indices:
        g, j = divmod(idx, n_poly)
        glwe = jnp.asarray(packed.glwes[g])[None]
        rotated = srv.monomial_div(glwe, jnp.asarray([[[j]]], dtype=jnp.uint64))
        lwe = np.asarray(srv.sample_extract(rotated))[0]
        out.append(Ciphertext(lwe, packed.degrees[idx], NOMINAL_NOISE,
                              packed.message_modulus, packed.carry_modulus))
    return out
