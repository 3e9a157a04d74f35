"""Noise squashing: re-encrypt a shortint ciphertext on the u128 torus.

Mirrors shortint/noise_squashing/ (server_key.rs:400 squash_ciphertext_noise,
private_key.rs) and the fft128 PBS it drives — the threshold-FHE supporting
feature that shrinks noise before decryption shares are released.  Pipeline
(atomic_pattern/standard.rs:63): u64 keyswitch with the compute KSK, then a
128-bit PBS with an identity LUT over the msg*carry space; the result is an
LWE under a dedicated u128 GLWE key.

The reference's PBS128 is split-double f64 FFT (104-bit mantissa); here it is
an exact 6-prime CRT-NTT (ops/server128.py) — stronger than the reference's
numerical guarantee.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import torus128
from ..core.params import DecompParams
from ..ops import ntt, server128
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform
from .ciphertext import Ciphertext
from .params import ShortintParams


@dataclass(frozen=True)
class NoiseSquashingParams:
    """shortint/parameters/noise_squashing.rs NoiseSquashingClassicParameters."""

    glwe_dimension: int
    polynomial_size: int
    glwe_noise_bound_log2: int  # TUniform bound on the u128 torus
    decomp_base_log: int
    decomp_level_count: int
    message_modulus: int
    carry_modulus: int

    @property
    def total_modulus(self) -> int:
        return self.message_modulus * self.carry_modulus

    @property
    def delta128(self) -> int:
        return (1 << 128) // (2 * self.total_modulus)


# v1_4/noise_squashing/p_fail_2_minus_128/mod.rs:8
V1_4_NOISE_SQUASHING_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = NoiseSquashingParams(
    glwe_dimension=2,
    polynomial_size=2048,
    glwe_noise_bound_log2=30,
    decomp_base_log=24,
    decomp_level_count=3,
    message_modulus=4,
    carry_modulus=4,
)

# fast insecure test config (pairs with shortint TEST_PARAM_MESSAGE_2_CARRY_2)
TEST_NOISE_SQUASHING_PARAM = NoiseSquashingParams(
    glwe_dimension=1,
    polynomial_size=512,
    glwe_noise_bound_log2=3,
    decomp_base_log=24,
    decomp_level_count=3,
    message_modulus=4,
    carry_modulus=4,
)


@dataclass
class SquashedNoiseCiphertext:
    """shortint/ciphertext/squashed_noise.rs: u128 LWE as (lo, hi) u64 pairs."""

    lo: np.ndarray
    hi: np.ndarray
    degree: int
    message_modulus: int
    carry_modulus: int


class NoiseSquashingPrivateKey:
    """Dedicated u128 GLWE secret key (noise_squashing/private_key.rs)."""

    def __init__(self, params: NoiseSquashingParams, seed: int | None = None):
        self.params = params
        if seed is None:
            seed = secrets.randbits(128)
        sec = SecretRandomGenerator(seed ^ 0x128128128)
        self.glwe_secret_key = torus128.generate_binary_glwe_secret_key128(
            params.glwe_dimension, params.polynomial_size, sec)
        self._key_bits = self.glwe_secret_key.to_lwe_key_bits()

    def decrypt_squashed_noise_ciphertext(self, ct: SquashedNoiseCiphertext) -> int:
        pt = torus128.decrypt_lwe128(self._key_bits, ct.lo, ct.hi)
        total = ct.message_modulus * ct.carry_modulus
        # decode128 rounds at the padding bit: msg_bits = log2(msg*carry)
        return torus128.decode128(pt, (total - 1).bit_length()) % total


class NoiseSquashingKey:
    """BSK128 over the compute small-LWE key (noise_squashing/server_key.rs)."""

    def __init__(self, client_key, private_key: NoiseSquashingPrivateKey,
                 seed: int | None = None):
        p: ShortintParams = client_key.params
        sp = private_key.params
        self.params = sp
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0x5175A5))
        noise = TUniform(sp.glwe_noise_bound_log2)
        # 8-prime plan: encryption needs binary-key products (2^140) but the
        # device external product needs 2^(11+23+128+log2(9)) ~ 2^166 — 6
        # primes suffice; use 6 for both to share tables.
        self.plan128 = ntt.make_plan(sp.polynomial_size, 6)
        decomp = DecompParams(sp.decomp_base_log, sp.decomp_level_count)
        bsk_lo, bsk_hi = torus128.generate_bootstrap_key128(
            client_key.lwe_secret_key, private_key.glwe_secret_key, decomp,
            noise, gen, self.plan128)
        self.bsk128_mont = jnp.asarray(
            torus128.bootstrap_key128_to_ntt(bsk_lo, bsk_hi, self.plan128))
        self.message_modulus = sp.message_modulus
        self.carry_modulus = sp.carry_modulus

    def squash_ciphertext_noise(self, ct: Ciphertext, server_key) -> SquashedNoiseCiphertext:
        return self.squash_ciphertext_noise_batch([ct], server_key)[0]

    def squash_ciphertext_noise_batch(self, cts: list, server_key) -> list:
        """One fused batched KS -> MS -> PBS128 for a list of ciphertexts."""
        p = server_key.params
        sp = self.params
        if cts[0].message_modulus != self.message_modulus:
            raise ValueError("Mismatched MessageModulus with NoiseSquashingKey")
        total = sp.total_modulus
        lut_lo, lut_hi = server128.generate_lut128(
            sp.polynomial_size, sp.glwe_dimension + 1, total, sp.delta128,
            lambda x: x)
        batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
        n = len(cts)
        l_lo = jnp.asarray(np.broadcast_to(lut_lo, (n,) + lut_lo.shape))
        l_hi = jnp.asarray(np.broadcast_to(lut_hi, (n,) + lut_hi.shape))
        out_lo, out_hi = server128.ks_pbs128_batch(
            batch, l_lo, l_hi, server_key.ksk, self.bsk128_mont,
            server_key.plan, self.plan128,
            p.ks_base_log, p.ks_level, sp.decomp_base_log, sp.decomp_level_count)
        out_lo = np.asarray(out_lo)
        out_hi = np.asarray(out_hi)
        return [
            SquashedNoiseCiphertext(out_lo[i], out_hi[i], cts[i].degree,
                                    self.message_modulus, self.carry_modulus)
            for i in range(n)
        ]
