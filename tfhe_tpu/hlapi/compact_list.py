"""Compact public key + compact ciphertext lists.

Mechanism (core_crypto lwe_compact_public_key / compact list expansion,
SURVEY.md §3.5): the public key is one GLWE-shaped pair (A, B = A (*) S + E)
under the compute GLWE key; encryption draws a fresh binary polynomial r and
produces ONE mask polynomial C1 = A (*) r + E1 plus a body polynomial
C2 = B (*) r + E2 + M(X) carrying up to N messages in its coefficients —
O(1) mask per N messages instead of one mask per message.  Expansion is a
sample extract per slot (ops/server.py), exactly the list-compression read
path.

ZK proofs of well-formedness (ProvenCompactCiphertextList / tfhe-zk-pok):
`build_with_proof` delegates to hlapi.proven_compact_list (zk/pke.py).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.encrypt import encrypt_glwe_assign
from ..ops import ntt, server as srv
from ..shortint.ciphertext import NOMINAL_NOISE, Ciphertext
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator


@dataclass
class CompactCiphertextList:
    glwe: np.ndarray  # (k+1, N)
    count: int
    message_modulus: int
    carry_modulus: int

    def expand(self) -> list:
        out = []
        g = jnp.asarray(self.glwe)[None]
        for j in range(self.count):
            rot = srv.monomial_div(g, jnp.asarray([[[j]]], dtype=jnp.uint64))
            lwe = np.asarray(srv.sample_extract(rot))[0]
            out.append(Ciphertext(lwe, self.message_modulus - 1, NOMINAL_NOISE,
                                  self.message_modulus, self.carry_modulus))
        return out


class CompactPublicKey:
    def __init__(self, client_key, seed: int | None = None):
        ck = client_key.integer_key.key if hasattr(client_key, "integer_key") else client_key
        p = ck.params
        self.params = p
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed ^ 0xC0AC29B7C97C50DD,
                                        DeterministicSeeder(seed ^ 0x3F84D5B5B5470917))
        glwe_sk = ck.glwe_secret_key
        # pk = GLWE encryption of zero: (A, B = A (*) S + E)
        body = np.zeros(p.polynomial_size, dtype=np.uint64)
        pk_ct = encrypt_glwe_assign(glwe_sk, body, p.glwe_noise, gen, p.bits)
        self.a = pk_ct.data[:-1]  # (k, N)
        self.b = pk_ct.data[-1]   # (N,)
        self._plan = ntt.make_plan(p.polynomial_size, 4)

    def encrypt_list(self, messages: list) -> CompactCiphertextList:
        p = self.params
        n_poly = p.polynomial_size
        assert len(messages) <= n_poly
        sec = SecretRandomGenerator(secrets.randbits(128))
        r = sec.binary_key(n_poly)  # fresh binary polynomial
        noise_gen = EncryptionRandomGenerator(secrets.randbits(128),
                                              DeterministicSeeder(secrets.randbits(128)))
        e1 = p.glwe_noise.sample(noise_gen.noise, p.glwe_dimension * n_poly, p.bits)
        e2 = p.glwe_noise.sample(noise_gen.noise, n_poly, p.bits)
        c1 = np.zeros((p.glwe_dimension, n_poly), dtype=np.uint64)
        for i in range(p.glwe_dimension):
            c1[i] = ntt.negacyclic_polymul_u64(self.a[i], r, self._plan, np) \
                + e1[i * n_poly : (i + 1) * n_poly]
        m_poly = np.zeros(n_poly, dtype=np.uint64)
        for j, m in enumerate(messages):
            m_poly[j] = np.uint64((int(m) % p.total_modulus) * p.delta)
        c2 = ntt.negacyclic_polymul_u64(self.b, r, self._plan, np) + e2 + m_poly
        glwe = np.concatenate([c1, c2[None, :]], axis=0)
        first_mod = p.message_modulus
        return CompactCiphertextList(glwe, len(messages), first_mod, p.carry_modulus)

    def build_with_proof(self, messages: list, crs, metadata: bytes = b"",
                         load=None):
        """Proven compact list (ProvenCompactCiphertextList): delegates to
        hlapi.proven_compact_list.build_with_proof (zk/pke.py pke-v1 proof)."""
        from . import proven_compact_list as pcl
        kwargs = {} if load is None else {"load": load}
        return pcl.build_with_proof(self, messages, crs, metadata, **kwargs)
