"""Compressed (seeded) shortint keys and ciphertexts.

Mirrors shortint CompressedServerKey / CompressedCiphertext: the KSK, BSK,
and ciphertext mask halves are regenerable from stored 128-bit seeds, so the
serialized form carries bodies only ((n+1)->1 for LWE, (k+1)->1 per GLWE
row).  Decompression rebuilds the NTT-domain device key.
"""

from __future__ import annotations

import secrets

from ..core import seeded as sd
from ..utils.csprng import ByteStream, DeterministicSeeder
from .ciphertext import NOMINAL_NOISE, Ciphertext
from .client_key import ClientKey
from .params import ShortintParams
from .server_key import ServerKey


class CompressedServerKey:
    def __init__(self, client_key: ClientKey, seed: int | None = None):
        p = client_key.params
        self.params = p
        if seed is None:
            seed = secrets.randbits(128)
        seeder = DeterministicSeeder(seed)
        noise_stream = ByteStream(seeder.seed())
        core = p.core
        self.seeded_ksk = sd.seed_generate_lwe_keyswitch_key(
            client_key.big_lwe_secret_key, client_key.lwe_secret_key,
            core.ks_decomp, p.lwe_noise, seeder, noise_stream, p.bits)
        self.seeded_bsk = sd.seed_generate_lwe_bootstrap_key(
            client_key.lwe_secret_key, client_key.glwe_secret_key,
            core.pbs_decomp, p.glwe_noise, seeder, noise_stream, p.bits)

    def decompress(self) -> ServerKey:
        return ServerKey.from_raw_keys(
            self.params, self.seeded_ksk.decompress(), self.seeded_bsk.decompress())


class CompressedCiphertext:
    """Seeded LWE encryption of one shortint message."""

    def __init__(self, client_key: ClientKey, message: int, seed: int | None = None):
        p = client_key.params
        self.params = p
        if seed is None:
            seed = secrets.randbits(128)
        seeder = DeterministicSeeder(seed)
        noise_stream = ByteStream(seeder.seed())
        encoded = (message % p.total_modulus) * p.delta
        self.inner = sd.seed_encrypt_lwe_list(
            client_key.encryption_key, [encoded], p.glwe_noise, seeder,
            noise_stream, p.bits)
        self.degree = p.message_modulus - 1

    def decompress(self) -> Ciphertext:
        p = self.params
        data = self.inner.decompress()[0]
        return Ciphertext(data, degree=self.degree, noise_level=NOMINAL_NOISE,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus)
