"""Oblivious pseudo-random function (shortint/oprf.rs:93-331).

A pseudorandom LWE is derived from a *public* seed (XOF keystream as the
mask, plus a centering body term); under the secret key its phase is
pseudorandom, and one PBS maps it to a uniform value in [0, 2^bits_count).
The server learns nothing about the output (it only sees the seed).

The reference seeds a blake3/sha3 XOF; here the XOF is the same AES-CTR
stream used everywhere else (domain-separated), which is an equally valid
PRF under AES.
"""

from __future__ import annotations

import numpy as np

from ..utils.csprng import ByteStream
from .ciphertext import NOMINAL_NOISE, Ciphertext
from .server_key import ServerKey

OPRF_DOMAIN = 0x4F505246  # "OPRF"


def pseudo_random_lwe(params, seed: int, bits: int = 64) -> np.ndarray:
    """Deterministic pseudorandom LWE (mask + body) from a public seed."""
    stream = ByteStream(seed ^ (OPRF_DOMAIN << 96))
    n = params.big_lwe_dimension
    data = stream.uniform_scalar(n + 1, bits)
    return data.astype(np.uint64)


def generate_oblivious_pseudo_random(
    sk: ServerKey, seed: int, random_bits_count: int | None = None
) -> Ciphertext:
    """Server-side: produce an encryption of a uniform pseudorandom value.

    The pseudorandom phase is uniform on the torus; a PBS with the identity
    staircase LUT over 2^bits boxes maps it to a uniform integer while
    normalizing the noise.
    """
    p = sk.params
    if random_bits_count is None:
        random_bits_count = (p.message_modulus - 1).bit_length()
    out_modulus = 1 << random_bits_count
    assert out_modulus <= p.message_modulus * p.carry_modulus

    data = pseudo_random_lwe(p, seed, p.bits)
    ct = Ciphertext(data, degree=p.total_modulus - 1, noise_level=NOMINAL_NOISE,
                    message_modulus=p.message_modulus,
                    carry_modulus=p.carry_modulus)
    # The phase is uniform over the full torus including the padding bit; use
    # a LUT whose two halves both enumerate [0, out_modulus) so the padding
    # bit folds away (the negacyclic halves add q/2 -> value + out_modulus/2
    # correction is absorbed mod out_modulus by the doubled staircase).
    lut = sk.generate_lookup_table(lambda x: x % out_modulus)
    out = sk.apply_lookup_table(ct, lut)
    out.degree = out_modulus - 1
    return out


# ---------------------------------------------------------------------------
# Dedicated OPRF keys (shortint/oprf.rs:93-331): a fresh small-LWE secret key
# plus a bootstrapping key to the target GLWE key.  The pseudorandom input is
# sampled directly in the modulus-switched domain [0, 2N) (the reference's
# PrfSeededModulusSwitched: XOF mask, zero body — no modulus switch), blind-
# rotated with the staircase OPRF LUT, and recentered with a post-PBS
# constant so the output is uniform in [0, 2^bits).
# ---------------------------------------------------------------------------


def generate_oprf_lut(params, random_bits_count: int) -> tuple:
    """(acc (k+1, N) u64, post_pbs_constant) — shortint/oprf.rs
    generate_oprf_lut: acc[i] = (2*(i // poly_delta) + 1) * delta / 2."""
    n = params.polynomial_size
    p2 = 1 << random_bits_count
    delta = params.delta
    poly_delta = 2 * n // p2
    idx = np.arange(n, dtype=np.uint64)
    body = (2 * (idx // np.uint64(poly_delta)) + 1) * np.uint64(delta // 2)
    acc = np.zeros((params.glwe_dimension + 1, n), dtype=np.uint64)
    acc[-1] = body
    post = np.uint64(((p2 - 1) * (delta // 2)) & ((1 << params.bits) - 1))
    return acc, post


class OprfPrivateKey:
    """Dedicated OPRF secret key: a fresh binary LWE key at the compute
    parameters' small LWE dimension (shortint/oprf.rs OprfPrivateKey)."""

    def __init__(self, client_key, seed: int | None = None):
        import secrets as _secrets

        from ..core import keygen as kg
        from ..utils.csprng import SecretRandomGenerator

        p = client_key.params
        assert not getattr(p, "ks32", False), "OPRF keys: Standard AP only"
        self.params = p
        if seed is None:
            seed = _secrets.randbits(128)
        gen = SecretRandomGenerator(seed ^ 0x4F505246)
        self.lwe_sk = kg.generate_binary_lwe_secret_key(p.lwe_dimension, gen)


class OprfServerKey:
    """Dedicated OPRF bootstrapping key: BSK from the OPRF LWE key to the
    target client key's GLWE key (shortint/oprf.rs OprfBootstrappingKey —
    exact CRT-NTT domain here instead of Fourier)."""

    def __init__(self, bsk_mont, plan, params, use_pallas: bool = False):
        self.bsk_mont = bsk_mont
        self.plan = plan
        self.params = params
        self.use_pallas = use_pallas

    @classmethod
    def new(cls, oprf_pk: OprfPrivateKey, target_ck, seed: int | None = None):
        import secrets as _secrets

        from ..core import keygen as kg
        from ..core.params import DecompParams
        from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator

        p = target_ck.params
        if seed is None:
            seed = _secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0x9E3779B9))
        bsk = kg.generate_lwe_bootstrap_key(
            oprf_pk.lwe_sk, target_ck.glwe_secret_key,
            DecompParams(p.pbs_base_log, p.pbs_level), p.glwe_noise, gen)
        bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)
        import jax.numpy as jnp
        return cls(jnp.asarray(bsk_mont), plan, p)

    @classmethod
    def from_compute_key(cls, sk: ServerKey):
        """The compute BSK as an OPRF key (ServerKey::as_oprf_key_view)."""
        return cls(sk.bsk_mont, sk.plan, sk.params,
                   getattr(sk, "use_pallas", False))

    def generate_bits_blocks(self, seed: int, bits_per_block: list) -> list:
        """One Ciphertext per entry, each uniform in [0, 2^bits); all masks
        drawn from one domain-separated XOF stream, one batched PBS."""
        import jax.numpy as jnp

        from ..ops import server as srv

        p = self.params
        n_in = self.bsk_mont.shape[0]
        two_n = 2 * p.polynomial_size
        # domain-separated from pseudo_random_lwe (dedicated-key stream)
        stream = ByteStream((seed ^ (OPRF_DOMAIN << 96) ^ (0xD5 << 120))
                            & ((1 << 128) - 1))
        nblk = len(bits_per_block)
        msed = np.zeros((nblk, n_in + 1), dtype=np.uint64)
        for i in range(nblk):
            msed[i, :-1] = stream.uniform_u64(n_in) & np.uint64(two_n - 1)
        luts, posts = [], []
        for bits in bits_per_block:
            acc, post = generate_oprf_lut(p, bits)
            luts.append(acc)
            posts.append(post)
        n_pad = 1 << (nblk - 1).bit_length() if nblk > 1 else 1
        if n_pad != nblk:
            msed = np.concatenate([msed, np.repeat(msed[:1], n_pad - nblk, 0)])
            luts += [luts[0]] * (n_pad - nblk)
        out = np.asarray(srv.pbs_from_switched_batch(
            jnp.asarray(msed), jnp.asarray(np.stack(luts)), self.bsk_mont,
            self.plan, p.pbs_base_log, p.pbs_level, p.bits,
            self.use_pallas))[:nblk]
        cts = []
        with np.errstate(over="ignore"):
            for i, bits in enumerate(bits_per_block):
                data = out[i].copy()
                data[-1] = data[-1] + posts[i]
                cts.append(Ciphertext(data, degree=(1 << bits) - 1,
                                      noise_level=NOMINAL_NOISE,
                                      message_modulus=p.message_modulus,
                                      carry_modulus=p.carry_modulus))
        return cts
