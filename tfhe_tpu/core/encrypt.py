"""Host-side LWE/GLWE encryption and decryption (numpy, exact wrapping).

Algorithms mirror tfhe/src/core_crypto/algorithms/{lwe,glwe}_encryption.rs:
  - LWE: mask <- uniform from the mask stream; body = <mask, sk> + encoded +
    noise (lwe_encryption.rs:99-113).
  - GLWE (assign form): mask <- uniform; body += per-coefficient noise; then
    body += sum_i mask_i (*) sk_i, negacyclic (glwe_encryption.rs:99-118).

The negacyclic multisum uses the exact CRT-NTT engine (binary secret keys:
bound N * 2^64 ~ 2^75 << P/2).
"""

from __future__ import annotations

import numpy as np

from ..ops import ntt
from ..utils.csprng import EncryptionRandomGenerator
from .entities import GlweCiphertext, GlweSecretKey, LweCiphertext, LweSecretKey


def _wrap(x: np.ndarray, bits: int):
    return x.astype(np.uint32 if bits == 32 else np.uint64)


def encrypt_lwe(
    sk: LweSecretKey,
    encoded: int,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> LweCiphertext:
    n = sk.dimension
    mask = gen.mask.uniform_scalar(n, bits)
    noise = int(noise_distribution.sample(gen.noise, 1, bits)[0])
    mask = _wrap(mask, bits)
    skd = _wrap(sk.data, bits)
    with np.errstate(over="ignore"):  # wrapping torus arithmetic is intended
        body = (
            np.sum(mask * skd, dtype=mask.dtype)
            + mask.dtype.type(encoded % (1 << bits))
            + mask.dtype.type(noise % (1 << bits))
        )
    data = np.concatenate([mask, np.array([body], dtype=mask.dtype)])
    return LweCiphertext(data, bits)


def decrypt_lwe(sk: LweSecretKey, ct: LweCiphertext) -> int:
    skd = _wrap(sk.data, ct.bits)
    dot = np.sum(ct.mask * skd, dtype=skd.dtype)
    return int(ct.body - dot)


def decode(plaintext: int, msg_bits: int, bits: int = 64) -> int:
    """Round to the top (msg_bits+1) bits and return the message value.

    Matches SignedDecomposer(msg_bits+1, 1).decode_plaintext: round-to-nearest
    at bit (bits - msg_bits - 1), keep msg_bits (the padding bit folds away
    mod 2^msg_bits).
    """
    shift = bits - msg_bits - 1
    rounded = ((plaintext >> (shift - 1)) + 1) >> 1
    return rounded % (1 << msg_bits)


def encode(msg: int, msg_bits: int, bits: int = 64) -> int:
    """Delta-scale with one padding bit: encoded = msg * 2^(bits-msg_bits-1)."""
    return (msg << (bits - msg_bits - 1)) % (1 << bits)


def encrypt_glwe_assign(
    sk: GlweSecretKey,
    body_init: np.ndarray,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> GlweCiphertext:
    """GLWE-encrypt with a pre-filled body polynomial (GGSW row encryption).

    body_init is consumed as the plaintext-carrying body content; returns the
    full (k+1, N) ciphertext.
    """
    k = sk.glwe_dimension
    n_poly = sk.polynomial_size
    mask = _wrap(gen.mask.uniform_scalar(k * n_poly, bits), bits).reshape(k, n_poly)
    noise = _wrap(noise_distribution.sample(gen.noise, n_poly, bits), bits)
    body = _wrap(body_init.copy(), bits) + noise
    plan = ntt.make_plan(n_poly)
    for i in range(k):
        prod = ntt.negacyclic_polymul_u64(
            mask[i].astype(np.uint64), sk.data[i].astype(np.uint64), plan, np
        )
        body = body + _wrap(prod, bits)
    data = np.concatenate([mask, body[None, :]], axis=0)
    return GlweCiphertext(data, bits)


def decrypt_glwe(sk: GlweSecretKey, ct: GlweCiphertext) -> np.ndarray:
    """body - sum_i mask_i (*) sk_i."""
    n_poly = sk.polynomial_size
    plan = ntt.make_plan(n_poly)
    acc = ct.body.copy()
    for i in range(sk.glwe_dimension):
        prod = ntt.negacyclic_polymul_u64(
            ct.mask[i].astype(np.uint64), sk.data[i].astype(np.uint64), plan, np
        )
        acc = acc - _wrap(prod, ct.bits)
    return acc
