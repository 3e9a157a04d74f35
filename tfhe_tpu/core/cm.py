"""Common-mask (CM) ciphertexts and algorithms (ref:
tfhe/src/core_crypto/experimental/{entities,algorithms}/common_mask_*).

A CM ciphertext shares ONE mask across `cm_dimension` bodies, each encrypted
under a DIFFERENT secret key: body_j = <mask, s_j> + m_j + e_j
(cm_lwe_encryption.rs:13-69).  This amortizes mask storage/bandwidth and —
the real payoff — lets ONE blind rotation bootstrap all slots at once: the
CM bootstrap key's GGSW entry for input position i encrypts the per-slot key
bits [s^in_1[i], .., s^in_C[i]] so a single shared-mask CMux chain advances
every slot's accumulator (cm_bootstrap.rs:75-171).

TPU-native representation: a CmLwe batch is a (B, n + C) u64 array and a
CmGlwe batch is (B, k + C, N) — the CM GGSW level matrices are (k+C, k+C)
squares, so the standard batched NTT external product
(ops/server.external_product_ntt) applies unchanged; the blind rotation is
the same lax.scan as the classic path with a per-slot initial body rotation.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from ..ops import server as srv
from ..utils.csprng import EncryptionRandomGenerator
from .entities import GlweSecretKey, LweSecretKey
from .params import DecompParams

U64 = jnp.uint64
M64 = 1 << 64


# ---------------------------------------------------------------------------
# CM LWE: encryption, decryption, linear algebra
# ---------------------------------------------------------------------------


def encrypt_cm_lwe(sks: list[LweSecretKey], encoded: list[int],
                   noise_distribution, gen: EncryptionRandomGenerator,
                   bits: int = 64) -> np.ndarray:
    """One shared uniform mask, one body per key (cm_lwe_encryption.rs:13).
    Returns (n + C,) u64 with layout [mask | bodies]."""
    assert len(sks) == len(encoded)
    n = sks[0].dimension
    mask = gen.mask.uniform_scalar(n, bits).astype(np.uint64)
    out = np.zeros(n + len(sks), dtype=np.uint64)
    out[:n] = mask
    with np.errstate(over="ignore"):
        for j, (sk, m) in enumerate(zip(sks, encoded)):
            noise = int(noise_distribution.sample(gen.noise, 1, bits)[0])
            dot = np.sum(mask * sk.data.astype(np.uint64), dtype=np.uint64)
            out[n + j] = dot + np.uint64(m % M64) + np.uint64(noise % M64)
    return out


def decrypt_cm_lwe(sks: list[LweSecretKey], ct: np.ndarray) -> list[int]:
    n = sks[0].dimension
    mask = ct[:n].astype(np.uint64)
    out = []
    with np.errstate(over="ignore"):
        for j, sk in enumerate(sks):
            dot = np.sum(mask * sk.data.astype(np.uint64), dtype=np.uint64)
            out.append(int(ct[n + j] - dot))
    return out


def cm_lwe_add(a, b):
    """cm_lwe_linear_algebra.rs: slot-wise wrapping add (mask adds too)."""
    return a + b


def cm_lwe_scalar_mul(a, scalar: int):
    return a * np.uint64(scalar % M64)


# ---------------------------------------------------------------------------
# CM keyswitch
# ---------------------------------------------------------------------------


@dataclass
class CmLweKeyswitchKey:
    """(n_in, l, n_out + C) u64 — each row is a CmLwe encrypting the input
    key element of EVERY input key in its own slot
    (cm_lwe_keyswitch_key_generation.rs:15-100)."""

    data: np.ndarray
    decomp: DecompParams

    @property
    def input_lwe_dimension(self) -> int:
        return self.data.shape[0]


def generate_cm_lwe_keyswitch_key(
    input_sks: list[LweSecretKey],
    output_sks: list[LweSecretKey],
    decomp: DecompParams,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> CmLweKeyswitchKey:
    assert len(input_sks) == len(output_sks)
    n_in = input_sks[0].dimension
    n_out = output_sks[0].dimension
    c = len(input_sks)
    levels = decomp.level_count
    out = np.zeros((n_in, levels, n_out + c), dtype=np.uint64)
    for i in range(n_in):
        for j in range(levels):
            level = levels - j
            msgs = [(int(sk.data[i]) << (bits - decomp.base_log * level))
                    % M64 for sk in input_sks]
            out[i, j] = encrypt_cm_lwe(output_sks, msgs, noise_distribution,
                                       gen, bits)
    return CmLweKeyswitchKey(out, decomp)


def cm_keyswitch(ct, cksk: CmLweKeyswitchKey, bits: int = 64):
    """Batched CM keyswitch (cm_lwe_keyswitch.rs:12): bodies copy through,
    then out -= sum decomp(mask_i) * ksk_row over the full [mask|bodies]
    vector.  ct: (B, n_in + C) u64 -> (B, n_out + C) u64."""
    n_in = cksk.data.shape[0]
    c = ct.shape[1] - n_in
    base_log, levels = cksk.decomp.base_log, cksk.decomp.level_count
    mask_in = ct[:, :n_in]
    digits = srv.signed_decompose(mask_in, base_log, levels, bits)
    b = ct.shape[0]
    d = jnp.transpose(digits, (1, 2, 0)).reshape(b, -1)
    k = jnp.asarray(cksk.data).reshape(-1, cksk.data.shape[-1])
    acc = srv._matmul_u64(d, k)
    out = jnp.zeros((b, k.shape[-1]), dtype=U64)
    out = out.at[:, -c:].set(ct[:, n_in:])
    return out - acc


# ---------------------------------------------------------------------------
# CM GLWE + GGSW
# ---------------------------------------------------------------------------


def encrypt_cm_glwe(sks: list[GlweSecretKey], body_inits: np.ndarray,
                    noise_distribution, gen: EncryptionRandomGenerator,
                    bits: int = 64) -> np.ndarray:
    """Shared k-poly mask, one body poly per GLWE key
    (cm_glwe_encryption.rs:18-116).  body_inits: (C, N) plaintext-carrying
    body contents.  Returns (k + C, N) u64."""
    k = sks[0].glwe_dimension
    n_poly = sks[0].polynomial_size
    c = len(sks)
    mask = gen.mask.uniform_scalar(k * n_poly, bits).astype(
        np.uint64).reshape(k, n_poly)
    out = np.zeros((k + c, n_poly), dtype=np.uint64)
    out[:k] = mask
    plan = ntt.make_plan(n_poly)
    with np.errstate(over="ignore"):
        for j, sk in enumerate(sks):
            noise = noise_distribution.sample(gen.noise, n_poly, bits).astype(
                np.uint64)
            body = body_inits[j].astype(np.uint64) + noise
            for i in range(k):
                body = body + ntt.negacyclic_polymul_u64(
                    mask[i], sk.data[i].astype(np.uint64), plan, np)
            out[k + j] = body
    return out


def decrypt_cm_glwe(sks: list[GlweSecretKey], ct: np.ndarray) -> np.ndarray:
    """(k + C, N) -> (C, N) plaintexts (cm_glwe_encryption.rs:237)."""
    k = sks[0].glwe_dimension
    n_poly = sks[0].polynomial_size
    plan = ntt.make_plan(n_poly)
    out = []
    with np.errstate(over="ignore"):
        for j, sk in enumerate(sks):
            acc = ct[k + j].astype(np.uint64).copy()
            for i in range(k):
                acc = acc - ntt.negacyclic_polymul_u64(
                    ct[i].astype(np.uint64), sk.data[i].astype(np.uint64),
                    plan, np)
            out.append(acc)
    return np.stack(out)


def encrypt_cm_ggsw(sks: list[GlweSecretKey], cleartexts: list[int],
                    decomp: DecompParams, noise_distribution,
                    gen: EncryptionRandomGenerator,
                    bits: int = 64) -> np.ndarray:
    """CM GGSW of per-slot cleartexts (cm_ggsw_encryption.rs:17-235).

    Level matrix rows (k + C total, each a CmGlwe of k + C polys):
      - mask row r < k encrypts [factor_j * sk_j[r]]_j
      - body row r = k + i encrypts [0, .., -factor_i * X^0, .., 0]
    factor_j = -cleartext_j * 2^(bits - base_log*level) (the GGSW factor).
    Returns (levels, k+C, k+C, N) u64, the same square layout as a standard
    GGSW so ops/server.external_product_ntt applies unchanged.
    """
    k = sks[0].glwe_dimension
    n_poly = sks[0].polynomial_size
    c = len(sks)
    assert len(cleartexts) == c
    levels = decomp.level_count
    rows = k + c
    out = np.zeros((levels, rows, rows, n_poly), dtype=np.uint64)
    lev_gens = gen.fork(levels, rows * k * n_poly, rows * c * n_poly,
                        noise_distribution, bits)
    with np.errstate(over="ignore"):
        for j in range(levels):
            level = levels - j
            factors = [(((-m) % M64) << (bits - decomp.base_log * level))
                       % M64 for m in cleartexts]
            row_gens = lev_gens[j].fork(rows, k * n_poly, c * n_poly,
                                        noise_distribution, bits)
            for r in range(rows):
                body_inits = np.zeros((c, n_poly), dtype=np.uint64)
                if r < k:
                    for slot, sk in enumerate(sks):
                        body_inits[slot] = (sk.data[r].astype(np.uint64)
                                            * np.uint64(factors[slot]))
                else:
                    slot = r - k
                    body_inits[slot, 0] = (-factors[slot]) % M64
                out[j, r] = encrypt_cm_glwe(sks, body_inits,
                                            noise_distribution, row_gens[r],
                                            bits)
    return out


def cm_ggsw_to_ntt(ggsw: np.ndarray, num_primes: int = 4):
    """Standard-domain CM GGSW -> NTT Montgomery u32 (+plan)."""
    n_poly = ggsw.shape[-1]
    plan = ntt.make_plan(n_poly, num_primes)
    fwd = ntt.forward_all(ggsw.astype(np.uint64), plan, np)
    return ntt.to_mont_all(fwd, plan, np).astype(np.uint32), plan


def cm_external_product(cm_glwe, cm_ggsw_mont, plan, base_log: int,
                        levels: int, bits: int = 64):
    """cm_ggsw_external_product.rs:45 — structurally the standard external
    product with glwe_size = k + C; batched (B, k+C, N)."""
    return srv.external_product_ntt(cm_glwe, cm_ggsw_mont, plan, base_log,
                                    levels, bits)


def cm_cmux(ct0, ct1, cm_ggsw_mont, plan, base_log: int, levels: int,
            bits: int = 64):
    """ct0 + GGSW (x) (ct1 - ct0), slot-selected by the per-slot cleartext
    bits (cm_ggsw_external_product.rs:184)."""
    return ct0 + cm_external_product(ct1 - ct0, cm_ggsw_mont, plan,
                                     base_log, levels, bits)


# ---------------------------------------------------------------------------
# CM bootstrap
# ---------------------------------------------------------------------------


def generate_cm_lwe_bootstrap_key(
    input_sks: list[LweSecretKey],
    glwe_sks: list[GlweSecretKey],
    decomp: DecompParams,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> np.ndarray:
    """BSK entry i = CM GGSW of [s^in_1[i], .., s^in_C[i]]
    (cm_lwe_bootstrap_key_generation.rs:70).  Returns
    (n_in, levels, k+C, k+C, N) u64."""
    assert len(input_sks) == len(glwe_sks)
    n_in = input_sks[0].dimension
    k = glwe_sks[0].glwe_dimension
    n_poly = glwe_sks[0].polynomial_size
    c = len(glwe_sks)
    rows = k + c
    levels = decomp.level_count
    ggsw_mask = levels * rows * k * n_poly
    ggsw_noise = levels * rows * c * n_poly
    ggsw_gens = gen.fork(n_in, ggsw_mask, ggsw_noise, noise_distribution,
                         bits)
    return np.stack([
        encrypt_cm_ggsw(glwe_sks, [int(sk.data[i]) for sk in input_sks],
                        decomp, noise_distribution, ggsw_gens[i], bits)
        for i in range(n_in)
    ])


def cm_bootstrap_key_to_ntt(cm_bsk: np.ndarray, num_primes: int = 4):
    """cm_lwe_bootstrap_key_conversion.rs analog."""
    n_poly = cm_bsk.shape[-1]
    plan = ntt.make_plan(n_poly, num_primes)
    fwd = ntt.forward_all(cm_bsk.astype(np.uint64), plan, np)
    return ntt.to_mont_all(fwd, plan, np).astype(np.uint32), plan


def cm_blind_rotate(ct, lut, cm_bsk_mont, plan, base_log: int, levels: int,
                    k: int, bits: int = 64):
    """cm_blind_rotate_assign (cm_bootstrap.rs:75): per-slot initial body
    rotation, then one shared-mask CMux chain for all slots.

    ct: (B, n + C) u64 CmLwe; lut: (N,) u64 accumulator polynomial (shared
    by every slot, as in the standard redundant-LUT encoding).
    Returns the final accumulator (B, k+C, N) u64.
    """
    b = ct.shape[0]
    c_dim = ct.shape[1] - cm_bsk_mont.shape[0]
    n_poly = lut.shape[-1]
    log_mod = int(2 * n_poly).bit_length() - 1
    msed = srv.modulus_switch(ct, log_mod, bits)
    mask, bodies = msed[:, :-c_dim], msed[:, -c_dim:]

    acc0 = jnp.zeros((b, k + c_dim, n_poly), dtype=U64)
    lut_b = jnp.broadcast_to(jnp.asarray(lut)[None, None],
                             (b, c_dim, n_poly))
    rotated = srv.monomial_div(lut_b, bodies[:, :, None])
    acc0 = acc0.at[:, k:, :].set(rotated)

    def step(acc, xs):
        a_i, ggsw = xs
        ct1 = srv.monomial_mul(acc, a_i[:, None, None]) - acc
        prod = srv.external_product_ntt(ct1, ggsw, plan, base_log, levels,
                                        bits)
        return acc + prod, None

    acc, _ = jax.lax.scan(step, acc0, (mask.T, cm_bsk_mont))
    return acc


def cm_sample_extract(acc, k: int):
    """cm_glwe_sample_extraction.rs: coefficient-0 LWE per slot, shared-mask
    form.  acc: (B, k+C, N) -> (B, k*N + C) CmLwe-style output where slot j
    decrypts under the flattened glwe key j.

    The standard extract mask (a_alpha[0], -a_alpha[N-1], ...) is shared by
    all slots because the mask polys are; bodies are the slot-0 coefficients
    of each body poly.
    """
    b, rows, n = acc.shape
    c_dim = rows - k
    mask_polys = acc[:, :k, :]
    # out_mask[alpha*N + j] = -a_alpha[N-j] for j>0, +a_alpha[0] at j=0
    rev = jnp.concatenate(
        [mask_polys[:, :, :1],
         jnp.zeros_like(mask_polys[:, :, 1:]) - mask_polys[:, :, :0:-1]],
        axis=2)
    bodies = acc[:, k:, 0]
    return jnp.concatenate([rev.reshape(b, k * n), bodies], axis=1)


def cm_bootstrap(ct, lut, cm_bsk_mont, plan, base_log: int, levels: int,
                 k: int, bits: int = 64):
    """Full CM PBS (cm_bootstrap.rs:171): blind rotate + per-slot extract.
    Returns (B, k*N + C) under the flattened GLWE keys."""
    acc = cm_blind_rotate(ct, lut, cm_bsk_mont, plan, base_log, levels, k,
                          bits)
    return cm_sample_extract(acc, k)


# ---------------------------------------------------------------------------
# CM packing + CM modulus-switch noise reduction
# ---------------------------------------------------------------------------


@dataclass
class CmLwePackingKey:
    """(C, n_in, l, n_out + C) u64 — part i switches standard LWEs under ONE
    input key into slot i of a CmLwe (cm_lwe_packing_key_generation.rs:16:
    part i's messages live in slot i only)."""

    data: np.ndarray
    decomp: DecompParams


def generate_cm_lwe_packing_key(
    input_sk: LweSecretKey,
    output_sks: list[LweSecretKey],
    decomp: DecompParams,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> CmLwePackingKey:
    n_in = input_sk.dimension
    n_out = output_sks[0].dimension
    c = len(output_sks)
    levels = decomp.level_count
    out = np.zeros((c, n_in, levels, n_out + c), dtype=np.uint64)
    for part in range(c):
        for i in range(n_in):
            for j in range(levels):
                level = levels - j
                v = (int(input_sk.data[i])
                     << (bits - decomp.base_log * level)) % M64
                msgs = [v if slot == part else 0 for slot in range(c)]
                out[part, i, j] = encrypt_cm_lwe(
                    output_sks, msgs, noise_distribution, gen, bits)
    return CmLwePackingKey(out, decomp)


def pack_lwe_ciphertexts_into_cm(cts, pk: CmLwePackingKey, bits: int = 64):
    """cm_lwe_packing.rs:12 — C standard LWEs (B, C, n_in+1) under one key
    -> (B, n_out + C) CmLwe, slot i holding ciphertext i's message."""
    b, c, _ = cts.shape
    n_in = pk.data.shape[1]
    base_log, levels = pk.decomp.base_log, pk.decomp.level_count
    out = None
    for part in range(c):
        digits = srv.signed_decompose(cts[:, part, :-1], base_log, levels,
                                      bits)
        d = jnp.transpose(digits, (1, 2, 0)).reshape(b, -1)
        kmat = jnp.asarray(pk.data[part]).reshape(-1, pk.data.shape[-1])
        acc = srv._matmul_u64(d, kmat)
        term = jnp.zeros_like(acc).at[:, -(c - part)].set(cts[:, part, -1])
        term = term - acc
        out = term if out is None else out + term
    return out


def cm_drift_ms_improve(ct, zeros, log_modulus: int, r_sigma: float,
                        input_variance_mod: float, c_dim: int):
    """CM drift-technique MS noise reduction
    (cm_modulus_switch_noise_reduction.rs:14-107): the measure is computed
    over the shared MASK only (body term zero), then the best zero-CmLwe is
    added to the whole [mask|bodies] vector.

    ct: (B, n + C) u64; zeros: (Z, n + C) u64 CmLwe encryptions of zero.
    """
    shift = np.uint64(64 - log_modulus)
    half = np.uint64(1 << (64 - log_modulus - 1))
    cands = jnp.concatenate([jnp.zeros_like(zeros[:1]), zeros], axis=0)
    c = ct[None, :, :] + cands[:, None, :]          # (Z+1, B, n+C)

    def round_err(x):
        rounded = ((x + half) >> shift) << shift
        return (rounded - x).astype(jnp.int64).astype(jnp.float32)

    mask_err = round_err(c[..., :-c_dim])
    expectancy = -jnp.sum(mask_err, axis=-1) / 2.0
    variance = jnp.sum(mask_err * mask_err, axis=-1) / 4.0
    measure = jnp.abs(expectancy) + jnp.sqrt(
        variance + input_variance_mod) * r_sigma
    best = jnp.argmin(measure, axis=0)
    return jnp.take_along_axis(c, best[None, :, None], axis=0)[0]
