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
    # True when encrypted under dedicated PKE parameters
    # (CompactCiphertextListExpansionKind::RequiresCasting): expansion MUST
    # go through a CompactPkeCastingKey into the compute set
    needs_casting: bool = False

    def expand(self, casting_key=None) -> list:
        if self.needs_casting and casting_key is None:
            raise ValueError(
                "this list was encrypted under dedicated PKE parameters "
                "(RequiresCasting): pass the CompactPkeCastingKey")
        out = []
        g = jnp.asarray(self.glwe)[None]
        for j in range(self.count):
            rot = srv.monomial_div(g, jnp.asarray([[[j]]], dtype=jnp.uint64))
            lwe = np.asarray(srv.sample_extract(rot))[0]
            out.append(Ciphertext(lwe, self.message_modulus - 1, NOMINAL_NOISE,
                                  self.message_modulus, self.carry_modulus))
        if casting_key is not None:
            out = casting_key.cast_batch(out)
        return out


class CompactPublicKey:
    """Compact public key — under the COMPUTE GLWE key (legacy flow, lists
    expand directly) or under a CompactPrivateKey's dedicated PKE instance
    (the reference default: lists carry needs_casting=True and expansion
    casts into the compute set)."""

    def __init__(self, client_key, seed: int | None = None):
        if isinstance(client_key, CompactPrivateKey):
            ck = client_key
            self._requires_casting = True
        else:
            ck = (client_key.integer_key.key
                  if hasattr(client_key, "integer_key") else client_key)
            self._requires_casting = False
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
        return CompactCiphertextList(glwe, len(messages), first_mod,
                                     p.carry_modulus,
                                     needs_casting=self._requires_casting)

    def build_with_proof(self, messages: list, crs, metadata: bytes = b"",
                         load=None):
        """Proven compact list (ProvenCompactCiphertextList): delegates to
        hlapi.proven_compact_list.build_with_proof (zk/pke.py pke-v1 proof)."""
        from . import proven_compact_list as pcl
        kwargs = {} if load is None else {"load": load}
        return pcl.build_with_proof(self, messages, crs, metadata, **kwargs)


class CompactPrivateKey:
    """Dedicated compact-public-key encryption secret (the reference's
    CompactPrivateKey): a GLWE secret under
    CompactPublicKeyEncryptionParameters, separate from the compute keys.
    Compact lists encrypted under it REQUIRE CASTING into the compute set
    during expansion (expansion_kind = RequiresCasting,
    v1_4/compact_public_key_only/p_fail_2_minus_128/ks_pbs.rs:8)."""

    def __init__(self, pke_params, seed: int | None = None):
        from ..core import keygen as kg
        from ..core.entities import LweSecretKey

        self.params = pke_params
        if seed is None:
            seed = secrets.randbits(128)
        gen = SecretRandomGenerator(seed)
        self.glwe_secret_key = kg.generate_binary_glwe_secret_key(
            pke_params.glwe_dimension, pke_params.polynomial_size, gen)
        # flattened LWE view (dim = k*N) for building the casting KSK
        self.encryption_key = LweSecretKey(
            np.asarray(self.glwe_secret_key.data).reshape(-1))

    def decrypt_list(self, lst: "CompactCiphertextList") -> list:
        """Debug/client-side decryption of a not-yet-cast list."""
        from ..core.encrypt import decrypt_glwe
        from ..core.entities import GlweCiphertext

        p = self.params
        pt = np.asarray(decrypt_glwe(self.glwe_secret_key,
                                     GlweCiphertext(np.asarray(lst.glwe))))
        out = []
        for j in range(lst.count):
            v = int(np.uint64(pt[j]))
            out.append(int(round(v / p.delta)) % p.total_modulus)
        return out


class CompactPkeCastingKey:
    """Keyswitching material from the dedicated PKE instance into the
    compute parameter set (shortint/key_switching_key/ +
    v1_4/key_switching/p_fail_2_minus_128/ks_pbs.rs).

    destination "big": one keyswitch lands directly on the compute big key
    (base 24 / level 1).  destination "small" (the reference default for
    ZKV2): keyswitch to the small key (base 4 / level 4) and a PBS refresh
    brings the value to the big key — `cast_batch` runs both stages.
    """

    def __init__(self, pke_private_key: CompactPrivateKey, client_key,
                 casting_params, server_key=None, seed: int | None = None):
        from ..core import keygen as kg
        from ..core.params import DecompParams

        ck = (client_key.integer_key.key
              if hasattr(client_key, "integer_key") else client_key)
        cp = ck.params
        pp = pke_private_key.params
        if (pp.message_modulus, pp.carry_modulus) != (
                cp.message_modulus, cp.carry_modulus):
            raise ValueError("mismatched message/carry moduli")
        self.params = casting_params
        self.dst_params = cp
        self.server_key = server_key
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0xCA5C))
        if casting_params.destination_key == "big":
            dst = ck.big_lwe_secret_key
            noise = cp.glwe_noise
        else:
            dst = ck.lwe_secret_key
            noise = cp.lwe_noise
            if server_key is None:
                raise ValueError(
                    "destination 'small' needs the compute ServerKey for "
                    "the PBS refresh to the big key")
        from ..core.params import DecompParams as _DP

        ksk = kg.generate_lwe_keyswitch_key(
            pke_private_key.encryption_key, dst,
            _DP(casting_params.ks_base_log, casting_params.ks_level),
            noise, gen, cp.bits)
        self.ksk = jnp.asarray(ksk.data)

    def cast_batch(self, cts: list) -> list:
        """Cast expanded PKE-domain LWEs into compute-domain ciphertexts
        (ONE fused keyswitch; + one batched PBS refresh for dest=small)."""
        from ..shortint.server_key import LookupTable

        cp = self.dst_params
        rows = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
        ks = srv.keyswitch(rows, self.ksk, self.params.ks_base_log,
                           self.params.ks_level, cp.bits)
        if self.params.destination_key == "big":
            out = np.asarray(ks)
            return [Ciphertext(out[i], cp.message_modulus - 1, NOMINAL_NOISE,
                               cp.message_modulus, cp.carry_modulus)
                    for i in range(len(cts))]
        # dest small: MS + blind rotate (identity LUT) + extract = the PBS
        # that lands the value on the big key.  Honor the compute set's MS
        # noise reduction (CENTERED_MEAN on all v1_4 production sets, DRIFT
        # on legacy ones) exactly as ks_pbs_batch does — a plain modulus
        # switch here would double the MS variance the 2^-128 p_fail budget
        # was tuned for (modulus_switch_noise_reduction.rs:202 analog).
        from ..shortint.params import MsNoiseReduction as _MsNR

        sk = self.server_key
        log_mod = cp.polynomial_size.bit_length()
        if getattr(sk, "drift_zeros", None) is not None:
            ks = srv.drift_ms_improve(
                ks, sk.drift_zeros, log_mod, cp.drift_r_sigma,
                cp.drift_ms_bound,
                cp.drift_input_variance * (2.0 ** cp.bits) ** 2)
        if cp.ms_noise_reduction == _MsNR.CENTERED_MEAN:
            corr = srv.centered_binary_ms_correction(ks, log_mod, cp.bits)
            body = srv.modulus_switch(ks[:, -1] + corr, log_mod, cp.bits)
        else:
            body = srv.modulus_switch(ks[:, -1], log_mod, cp.bits)
        msed_mask = srv.modulus_switch(ks[:, :-1], log_mod, cp.bits)
        msed = jnp.concatenate([msed_mask, body[:, None]], axis=-1)
        lut = sk.generate_lookup_table(lambda x: x)
        lut_b = jnp.asarray(np.broadcast_to(
            lut.acc, (len(cts),) + lut.acc.shape))
        out = np.asarray(srv.pbs_from_switched_batch(
            msed, lut_b, sk.bsk_mont, sk.plan, cp.pbs_base_log,
            cp.pbs_level, cp.bits))
        return [Ciphertext(out[i], cp.message_modulus - 1, NOMINAL_NOISE,
                           cp.message_modulus, cp.carry_modulus)
                for i in range(len(cts))]
