"""Casting keys between shortint parameter sets.

Mirrors shortint/key_switching_key/: a KeySwitchingKey holds an LWE keyswitch
key from the source params' encryption key to the destination params' big
key, letting ciphertexts encrypted under one parameter set (e.g. a dedicated
compact-public-key set) be cast into the compute set.  Message/carry moduli
must match (the reference refuses mismatched moduli too).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import keygen as kg
from ..core.params import DecompParams
from ..ops import server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator
from .ciphertext import NOMINAL_NOISE, Ciphertext


@dataclass(frozen=True)
class ShortintKeySwitchingParams:
    """shortint/parameters/key_switching.rs ShortintKeySwitchingParameters."""

    ks_base_log: int
    ks_level: int


class KeySwitchingKey:
    def __init__(self, src_client_key, dst_client_key,
                 params: ShortintKeySwitchingParams | None = None,
                 seed: int | None = None):
        sp, dp = src_client_key.params, dst_client_key.params
        if (sp.message_modulus, sp.carry_modulus) != (dp.message_modulus, dp.carry_modulus):
            raise ValueError("mismatched message/carry moduli between parameter sets")
        if params is None:
            params = ShortintKeySwitchingParams(dp.ks_base_log, dp.ks_level)
        self.params = params
        self.dst_params = dp
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0xCA57))
        ksk = kg.generate_lwe_keyswitch_key(
            src_client_key.encryption_key, dst_client_key.big_lwe_secret_key,
            DecompParams(params.ks_base_log, params.ks_level),
            dp.glwe_noise, gen, dp.bits)
        self.ksk = jnp.asarray(ksk.data)

    def cast_batch(self, cts: list) -> list:
        """Keyswitch a batch of source-set ciphertexts into the destination
        set (one fused device call)."""
        dp = self.dst_params
        batch = jnp.asarray(np.stack([np.asarray(c.data) for c in cts]))
        out = np.asarray(srv.keyswitch(batch, self.ksk, self.params.ks_base_log,
                                       self.params.ks_level, dp.bits))
        return [
            Ciphertext(out[i], degree=c.degree, noise_level=NOMINAL_NOISE,
                       message_modulus=dp.message_modulus,
                       carry_modulus=dp.carry_modulus)
            for i, c in enumerate(cts)
        ]

    def cast(self, ct: Ciphertext) -> Ciphertext:
        return self.cast_batch([ct])[0]
