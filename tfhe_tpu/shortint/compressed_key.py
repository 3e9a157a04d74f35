"""Compressed (seeded) shortint keys and ciphertexts.

Mirrors shortint CompressedServerKey / CompressedCiphertext: the KSK, BSK,
and ciphertext mask halves are regenerable from stored 128-bit seeds, so the
serialized form carries bodies only ((n+1)->1 for LWE, (k+1)->1 per GLWE
row).  Decompression rebuilds the NTT-domain device key.
"""

from __future__ import annotations

import secrets

import numpy as np

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
        # mask-floor the seeded BSK for MXU-family params (same soundness
        # rationale as ServerKey.__init__): adjust the stored bodies by the
        # dropped-mask-bits convolution and record the floor, so the
        # decompressed key IS the floored key and rides the fast 3-prime
        # rounded plan instead of the 4-prime fallback.
        from ..core import security as _sec
        from .server_key import _mxu_family, _mxu_round_bits

        rb = _mxu_round_bits()
        if _mxu_family(p) and rb > 0:
            kn = p.glwe_dimension * p.polynomial_size
            ok_f, detail = _sec.check_lwe_noise_secure(
                p.glwe_noise, kn, p.bits, modulus_log2_shrink=rb)
            ok_p, _ = _sec.check_lwe_noise_secure(p.glwe_noise, kn, p.bits)
            if not ok_f and ok_p:
                # same policy as ServerKey.__init__: refuse to degrade a
                # secure set below the estimator curve by flooring
                raise ValueError(
                    f"BSK mask flooring at rb={rb} would degrade a secure "
                    f"parameter set below the estimator curve: {detail}; "
                    "lower TFHE_TPU_MXU_ROUND_BITS or use 4 primes")
            if ok_f or not ok_p:
                import dataclasses

                from ..core.entities import LweBootstrapKey
                from ..ops import mxu as _mxu

                full = LweBootstrapKey(self.seeded_bsk.decompress(),
                                       core.pbs_decomp, p.bits)
                floored = _mxu.mask_floor_bsk(
                    full, client_key.glwe_secret_key, rb)
                self.seeded_bsk = dataclasses.replace(
                    self.seeded_bsk,
                    bodies=np.ascontiguousarray(
                        floored.data[..., p.glwe_dimension, :]),
                    mask_floor_rb=rb)

    def decompress(self) -> ServerKey:
        return ServerKey.from_raw_keys(
            self.params, self.seeded_ksk.decompress(),
            self.seeded_bsk.decompress(),
            bsk_floored=getattr(self.seeded_bsk, "mask_floor_rb", 0))


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
