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
