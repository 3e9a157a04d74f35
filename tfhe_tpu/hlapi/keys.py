"""Key types and generate_keys (high_level_api/keys/mod.rs:44)."""

from __future__ import annotations

import secrets

from ..integer.client_key import ClientKey as IntegerClientKey
from ..integer.server_key import ServerKey as IntegerServerKey
from .config import Config


class ClientKey:
    def __init__(self, config: Config, seed: int | None = None):
        self.config = config
        self.seed = secrets.randbits(128) if seed is None else seed
        self.integer_key = IntegerClientKey(config.shortint_params, self.seed)
        self.noise_squashing_private_key = None
        if config.enable_noise_squashing:
            from ..integer.noise_squashing import NoiseSquashingPrivateKey

            self.noise_squashing_private_key = NoiseSquashingPrivateKey(
                config.noise_squashing_params, self.seed ^ 0x5C0A5)

    def decrypt_squashed(self, ct) -> int:
        """Decrypt a SquashedNoiseRadixCiphertext (requires noise squashing
        enabled in the config)."""
        if self.noise_squashing_private_key is None:
            raise ValueError("noise squashing not enabled in Config")
        inner = ct.inner if hasattr(ct, "inner") else ct
        return self.noise_squashing_private_key.decrypt_radix(inner)

    @classmethod
    def generate(cls, config: Config, seed: int | None = None) -> "ClientKey":
        return cls(config, seed)


class ServerKey:
    def __init__(self, client_key: ClientKey):
        self.integer_key = IntegerServerKey(client_key.integer_key)
        self.config = client_key.config
        self.noise_squashing_key = None
        if client_key.noise_squashing_private_key is not None:
            from ..integer.noise_squashing import NoiseSquashingKey

            self.noise_squashing_key = NoiseSquashingKey(
                client_key.integer_key, client_key.noise_squashing_private_key,
                client_key.seed ^ 0x5C0A6)


class CompressedServerKey:
    """Compressed (seeded) server key: stores seeded BSK/KSK bodies whose
    public mask halves regenerate from 128-bit seeds
    (SeededLweBootstrapKey / SeededLweKeyswitchKey, seeded_*_decompression.rs).
    """

    def __init__(self, client_key: ClientKey, seed: int | None = None):
        from ..shortint.compressed_key import CompressedServerKey as ShortintCompressed

        self.config = client_key.config
        self._compressed = ShortintCompressed(client_key.integer_key.key, seed)

    def decompress(self) -> ServerKey:
        from ..integer.server_key import ServerKey as IntegerServerKey

        obj = ServerKey.__new__(ServerKey)
        obj.config = self.config
        obj.noise_squashing_key = None
        inner = IntegerServerKey.__new__(IntegerServerKey)
        inner.key = self._compressed.decompress()
        inner.params = inner.key.params
        inner.msg = inner.params.message_modulus
        inner._luts = {}
        obj.integer_key = inner
        return obj


class PublicKey:
    """Classic LWE public key (list of encryptions of zero).

    encrypt(value) = random subset-sum of zero-encryptions + encoded message
    (core_crypto/algorithms/lwe_public_key_generation.rs semantics).
    """

    def __init__(self, client_key: ClientKey, zero_count: int | None = None):
        import numpy as np

        ck = client_key.integer_key.key
        p = ck.params
        n = ck.encryption_key.dimension
        # lwe_public_key_zero_encryption_count = n*ceil(log2 q) + 128
        # (core_crypto/algorithms/lwe_public_key_generation.rs + the
        # parameter sets): the count the leftover-hash-lemma argument needs.
        # A custom smaller count may be passed for tests only.
        self.zero_count = zero_count or (n * p.bits + 128)
        self.params = p
        # chunked batch generation: one mask-stream block and one noise
        # block per chunk draw byte-identical streams to the sequential
        # per-row encrypt_lwe loop (mask and noise generators are
        # independent), but the binary-key multisum runs vectorized.
        gen = ck.encryption_generator
        dt = np.uint32 if p.bits == 32 else np.uint64
        skd = np.asarray(ck.encryption_key.data).astype(dt)
        ones = np.nonzero(skd)[0]
        out = np.empty((self.zero_count, n + 1), dtype=dt)
        chunk = max(1, (64 << 20) // (8 * n))      # ~64 MB of mask per chunk
        with np.errstate(over="ignore"):
            for s in range(0, self.zero_count, chunk):
                c = min(chunk, self.zero_count - s)
                mask = gen.mask.uniform_scalar(c * n, p.bits)
                mask = mask.astype(dt).reshape(c, n)
                noise = p.glwe_noise.sample(gen.noise, c, p.bits).astype(dt)
                out[s:s + c, :n] = mask
                out[s:s + c, n] = mask[:, ones].sum(axis=1,
                                                    dtype=dt) + noise
        self._zeros = out

    def encrypt_block(self, message: int):
        import secrets as _s

        import numpy as np

        from ..shortint.ciphertext import NOMINAL_NOISE, Ciphertext

        p = self.params
        mask_bits = np.frombuffer(_s.token_bytes(self.zero_count), dtype=np.uint8) & 1
        acc = self._zeros[mask_bits.astype(bool)].sum(axis=0, dtype=np.uint64)
        acc[-1] = acc[-1] + np.uint64((message % p.total_modulus) * p.delta)
        return Ciphertext(acc, degree=p.message_modulus - 1,
                          noise_level=NOMINAL_NOISE,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus)


def generate_keys(config: Config | None = None, seed: int | None = None):
    config = config or Config()
    ck = ClientKey(config, seed)
    sk = ServerKey(ck)
    return ck, sk
