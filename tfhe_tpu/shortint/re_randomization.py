"""Ciphertext re-randomization: XOF-seeded zero encryptions added in place.

Mirrors shortint/ciphertext/re_randomization.rs:108-326 — before releasing
ciphertexts to a threshold-decryption committee, the server adds a
DETERMINISTIC compact-public-key encryption of zero derived from a public
seed and domain-separation context via an XOF (the reference uses blake3 /
sha3; here SHAKE-256).  Determinism means any party can re-derive and verify
the re-randomization; freshness comes from the seed.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ops import ntt
from ..utils.csprng import ByteStream, DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator
from .ciphertext import Ciphertext

DOMAIN_SEP = b"TFHE_Rrd"  # re_randomization.rs domain separator analog


def _xof_seed(seed: bytes, context: bytes) -> int:
    h = hashlib.shake_256(DOMAIN_SEP + len(seed).to_bytes(8, "little") + seed
                          + context).digest(16)
    return int.from_bytes(h, "little")


class ReRandomizationKey:
    """Server-side re-randomization material: the compact public key's GLWE
    pair (a, b) — zero encryptions are derived from it deterministically."""

    def __init__(self, compact_public_key):
        self.pk = compact_public_key
        self.params = compact_public_key.params

    def _zero_lwes(self, count: int, seed128: int) -> np.ndarray:
        """`count` deterministic LWE zero-encryptions under the big key:
        one CPK GLWE-of-zero, then per-slot sample extraction."""
        p = self.params
        n_poly = p.polynomial_size
        assert count <= n_poly
        sec = SecretRandomGenerator(seed128)
        r = sec.binary_key(n_poly)
        noise_gen = EncryptionRandomGenerator(
            seed128 ^ 0x72657261, DeterministicSeeder(seed128 ^ 0x646F6D31))
        e1 = p.glwe_noise.sample(noise_gen.noise, p.glwe_dimension * n_poly, p.bits)
        e2 = p.glwe_noise.sample(noise_gen.noise, n_poly, p.bits)
        plan = self.pk._plan
        with np.errstate(over="ignore"):
            c1 = np.zeros((p.glwe_dimension, n_poly), dtype=np.uint64)
            for i in range(p.glwe_dimension):
                c1[i] = ntt.negacyclic_polymul_u64(self.pk.a[i], r, plan, np) \
                    + e1[i * n_poly : (i + 1) * n_poly]
            c2 = ntt.negacyclic_polymul_u64(self.pk.b, r, plan, np) + e2
        glwe = np.concatenate([c1, c2[None, :]], axis=0)
        # sample extract slot j for each output
        import jax.numpy as jnp

        from ..ops import server as srv

        g = jnp.asarray(glwe)[None]
        out = np.empty((count, p.big_lwe_dimension + 1), dtype=np.uint64)
        for j in range(count):
            rot = srv.monomial_div(g, jnp.asarray([[[j]]], dtype=jnp.uint64))
            out[j] = np.asarray(srv.sample_extract(rot))[0]
        return out

    def re_randomize_batch(self, cts: list, seed: bytes, context: bytes = b"") -> list:
        """ct_i + Enc_pk(0; XOF(seed, context, i)) — deterministic given
        (seed, context); output noise grows by one fresh-encryption term."""
        seed128 = _xof_seed(seed, context)
        zeros = self._zero_lwes(len(cts), seed128)
        out = []
        with np.errstate(over="ignore"):
            for i, c in enumerate(cts):
                data = np.asarray(c.data) + zeros[i]
                out.append(c.with_data(data, degree=c.degree,
                                       noise_level=c.noise_level + 1))
        return out

    def re_randomize(self, ct: Ciphertext, seed: bytes, context: bytes = b"") -> Ciphertext:
        return self.re_randomize_batch([ct], seed, context)[0]
