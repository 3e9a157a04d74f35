"""Experimental core_crypto features (ref: tfhe/src/core_crypto/experimental/).

TPU-native implementations of the reference's `experimental`-gated research
primitives:

- partial / shared secret-key generation
  (partial_glwe_secret_key_generation.rs, shared_lwe_secret_key_generation.rs,
  shared_glwe_secret_key_generation.rs)
- shrinking keyswitch: large LWE key -> a prefix-shared smaller key, with key
  material only for the non-shared tail
  (lwe_shrinking_keyswitch_key_generation.rs, lwe_shrinking_keyswitch.rs)
- pseudo-GGSW encryption + the GLWE fast keyswitch
  (pseudo_ggsw_encryption.rs, glwe_fast_keyswitch.rs) — a GLWE keyswitch as
  one external product where only the input mask is decomposed
- partial sample extraction / partial constant-GLWE conversion
  (glwe_partial_sample_extraction.rs)
- extended PBS (lwe_extended_programmable_bootstrapping.rs, eprint 2025/2214):
  a LUT over an extended polynomial of size N*E evaluated with the standard
  size-N bootstrap key, as E interleaved small accumulators

All server-side ops are batched (leading B axis) and jit-compatible: the
per-step slot permutation of the extended PBS is a take_along_axis gather and
the per-slot monomial degrees are computed branch-free, so the whole rotation
stays one `lax.scan` like the standard blind rotate.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from ..ops import server as srv
from ..utils.csprng import EncryptionRandomGenerator, SecretRandomGenerator
from .encrypt import encrypt_glwe_assign
from .entities import GlweSecretKey, LweKeyswitchKey, LweSecretKey
from .keygen import generate_lwe_keyswitch_key
from .params import DecompParams

U64 = jnp.uint64


# ---------------------------------------------------------------------------
# Partial / shared secret keys
# ---------------------------------------------------------------------------


def generate_partial_binary_glwe_secret_key(
    k: int, n_poly: int, fill_count: int, gen: SecretRandomGenerator,
    bits: int = 64,
) -> GlweSecretKey:
    """GLWE key with only the first `fill_count` coefficients random, rest 0
    (partial_glwe_secret_key_generation.rs:16-38)."""
    assert 0 <= fill_count <= k * n_poly
    data = np.zeros(k * n_poly, dtype=np.uint64)
    data[:fill_count] = gen.binary_key(fill_count)
    data = data.reshape(k, n_poly)
    if bits == 32:
        data = data.astype(np.uint32)
    return GlweSecretKey(data, bits)


def generate_fully_shared_binary_lwe_secret_key(
    large_sk: LweSecretKey, small_dim: int
) -> LweSecretKey:
    """Small LWE key = prefix of the large key
    (shared_lwe_secret_key_generation.rs)."""
    assert small_dim <= large_sk.dimension
    return LweSecretKey(large_sk.data[:small_dim].copy(), large_sk.bits)


def generate_shared_glwe_secret_key_from_glwe_secret_key(
    large_sk: GlweSecretKey, k_out: int, n_poly_out: int
) -> GlweSecretKey:
    """GLWE key sharing its flattened prefix with a larger GLWE key
    (shared_glwe_secret_key_generation.rs:5)."""
    assert k_out * n_poly_out <= large_sk.glwe_dimension * large_sk.polynomial_size
    flat = large_sk.data.reshape(-1)[: k_out * n_poly_out]
    return GlweSecretKey(flat.reshape(k_out, n_poly_out).copy(), large_sk.bits)


# ---------------------------------------------------------------------------
# Shrinking keyswitch
# ---------------------------------------------------------------------------


@dataclass
class LweShrinkingKeyswitchKey:
    """KSK from the tail of a large key to its shared prefix
    (entities/lwe_shrinking_keyswitch_key.rs).  `ksk` switches the
    (n_in - shared) tail coefficients to the prefix key of dim `shared`."""

    ksk: LweKeyswitchKey
    shared_randomness: int

    @property
    def input_lwe_dimension(self) -> int:
        return self.shared_randomness + self.ksk.input_lwe_dimension

    @property
    def output_lwe_dimension(self) -> int:
        return self.shared_randomness


def generate_lwe_shrinking_keyswitch_key(
    input_sk: LweSecretKey,
    shared_coef_count: int,
    decomp: DecompParams,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> LweShrinkingKeyswitchKey:
    """lwe_shrinking_keyswitch_key_generation.rs:16-47: a standard KSK from
    input_sk[shared:] to input_sk[:shared] (identical generator stream)."""
    assert shared_coef_count <= input_sk.dimension
    prefix_sk = LweSecretKey(input_sk.data[:shared_coef_count], bits)
    tail_sk = LweSecretKey(input_sk.data[shared_coef_count:], bits)
    ksk = generate_lwe_keyswitch_key(tail_sk, prefix_sk, decomp,
                                     noise_distribution, gen, bits)
    return LweShrinkingKeyswitchKey(ksk, shared_coef_count)


def shrinking_keyswitch(ct, sksk: LweShrinkingKeyswitchKey, bits: int = 64):
    """Batched shrinking keyswitch (lwe_shrinking_keyswitch.rs:96).

    ct: (B, n_in+1) u64 under the large key.  The shared prefix of the mask
    passes through untouched; only the tail is decomposed against the KSK.
    Returns (B, n_shared+1) u64 under the prefix key.
    """
    n2 = sksk.shared_randomness
    tail_ct = jnp.concatenate([ct[:, n2:-1], ct[:, -1:]], axis=1)
    out = srv.keyswitch(tail_ct, jnp.asarray(sksk.ksk.data),
                        sksk.ksk.decomp.base_log, sksk.ksk.decomp.level_count,
                        bits)
    return out.at[:, :n2].add(ct[:, :n2])


# ---------------------------------------------------------------------------
# Pseudo-GGSW + GLWE fast keyswitch
# ---------------------------------------------------------------------------


@dataclass
class PseudoGgswCiphertext:
    """GGSW with non-square level matrices: one row per *input* mask
    polynomial, no row for the body (entities/pseudo_ggsw_ciphertext.rs:9-14).
    data: (k_in, l, k_out+1, N) standard domain."""

    data: np.ndarray
    decomp: DecompParams
    bits: int = 64

    @property
    def input_glwe_dimension(self) -> int:
        return self.data.shape[0]

    @property
    def output_glwe_dimension(self) -> int:
        return self.data.shape[2] - 1

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]


def encrypt_pseudo_ggsw(
    glwe_sk_out: GlweSecretKey,
    glwe_sk_in: GlweSecretKey,
    decomp: DecompParams,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> PseudoGgswCiphertext:
    """pseudo_ggsw_encryption.rs:17-110: row (level j, input poly i) is a
    GLWE encryption under sk_out of -S_in_i(X) * 2^(bits - base_log*level).
    Fork tree: levels -> rows, mirroring the reference's fork config."""
    k_in = glwe_sk_in.glwe_dimension
    k_out = glwe_sk_out.glwe_dimension
    n_poly = glwe_sk_in.polynomial_size
    assert n_poly == glwe_sk_out.polynomial_size
    levels = decomp.level_count
    out = np.zeros((k_in, levels, k_out + 1, n_poly),
                   dtype=np.uint32 if bits == 32 else np.uint64)
    lev_gens = gen.fork(levels, k_in * k_out * n_poly, k_in * n_poly,
                        noise_distribution, bits)
    with np.errstate(over="ignore"):
        for j in range(levels):
            level = levels - j
            factor = ((-1 << (bits - decomp.base_log * level))
                      % (1 << bits))
            row_gens = lev_gens[j].fork(k_in, k_out * n_poly, n_poly,
                                        noise_distribution, bits)
            for i in range(k_in):
                body_init = (glwe_sk_in.data[i].astype(np.uint64)
                             * np.uint64(factor))
                if bits == 32:
                    body_init = body_init & np.uint64(0xFFFFFFFF)
                ct = encrypt_glwe_assign(glwe_sk_out, body_init,
                                         noise_distribution, row_gens[i],
                                         bits)
                out[i, j] = ct.data
    return PseudoGgswCiphertext(out, decomp, bits)


def pseudo_ggsw_to_ntt(pggsw: PseudoGgswCiphertext, num_primes: int = 4):
    """NTT-domain Montgomery form (pseudo_ggsw_conversion.rs analog).
    Returns (data u32 (k_in, l, k_out+1, P, N), plan)."""
    n_poly = pggsw.polynomial_size
    plan = ntt.make_plan(n_poly, num_primes)
    fwd = ntt.forward_all(pggsw.data.astype(np.uint64), plan, np)
    mont = ntt.to_mont_all(fwd, plan, np)
    return mont.astype(np.uint32), plan


def glwe_fast_keyswitch(glwe, pggsw_mont, plan, base_log: int, levels: int,
                        bits: int = 64):
    """Batched GLWE fast keyswitch (glwe_fast_keyswitch.rs:173-297).

    glwe: (B, k_in+1, N) u64; pggsw_mont: (k_in, l, k_out+1, P, N) u32.
    Only the input mask polynomials are decomposed and multiplied against
    the pseudo-GGSW rows; the body is added through.  Returns
    (B, k_out+1, N) u64 under the output key.
    """
    mask = glwe[:, :-1, :]                                   # (B, k_in, N)
    digits = srv.signed_decompose(mask, base_log, levels, bits)
    res = srv._digits_to_residues(digits, plan)              # (l, B, k_in, P, N)
    fwd = ntt.ntt_forward_stacked(res, plan, jnp)
    key = pggsw_mont.astype(U64)                             # (k_in, l, c, P, N)
    acc = None
    for lev in range(levels):
        for i in range(key.shape[0]):
            prod = ntt.pointwise_mul_mont_stacked(
                fwd[lev][:, i, None, :, :], key[i, lev][None, :, :, :],
                plan, jnp)                                   # (B, c, P, N)
            acc = prod if acc is None else ntt.add_mod_stacked(acc, prod,
                                                               plan, jnp)
    coeffs = ntt.ntt_inverse_stacked(acc, plan, jnp)
    out = ntt.garner_to_u64(coeffs, plan, jnp)               # (B, k_out+1, N)
    return out.at[:, -1, :].add(glwe[:, -1, :])


# ---------------------------------------------------------------------------
# Partial sample extraction
# ---------------------------------------------------------------------------


def partial_extract_lwe_sample(glwe, nth: int, phi: int):
    """glwe_partial_sample_extraction.rs:96: extract coefficient `nth` into
    an LWE of dimension `phi` under the flattened-prefix key.

    glwe: (B, k+1, N) u64.  Only the first `phi` mask coefficients are kept
    (the tail of a partial key is zero, so they carry no information).
    Returns (B, phi+1) u64.
    """
    b, _, n = glwe.shape
    body = glwe[:, -1, nth]
    flat = glwe[:, :-1, :].reshape(b, -1)
    i = np.arange(phi)
    alpha = i // n
    beta = (n - i) % n
    src = alpha * n + beta
    picked = flat[:, src]
    mask = jnp.where(jnp.asarray(beta != 0)[None, :],
                     jnp.zeros_like(picked) - picked, picked)
    return jnp.concatenate([mask, body[:, None]], axis=1)


def partial_convert_lwe_to_constant_glwe(lwe, k: int, n_poly: int):
    """glwe_partial_sample_extraction.rs:237: embed an LWE (under a
    flattened-prefix GLWE key) back into a GLWE whose constant coefficient
    is the LWE's plaintext.  lwe: (B, phi+1) u64 -> (B, k+1, N) u64."""
    b = lwe.shape[0]
    phi = lwe.shape[1] - 1
    assert phi <= k * n_poly
    flat = jnp.zeros((b, k * n_poly), dtype=lwe.dtype)
    i = np.arange(phi)
    alpha = i // n_poly
    beta = (n_poly - i) % n_poly
    dst = alpha * n_poly + beta
    vals = jnp.where(jnp.asarray(beta != 0)[None, :],
                     jnp.zeros_like(lwe[:, :phi]) - lwe[:, :phi],
                     lwe[:, :phi])
    flat = flat.at[:, dst].set(vals)
    body = jnp.zeros((b, 1, n_poly), dtype=lwe.dtype)
    body = body.at[:, 0, 0].set(lwe[:, -1])
    return jnp.concatenate([flat.reshape(b, k, n_poly), body], axis=1)


# ---------------------------------------------------------------------------
# Extended PBS (eprint 2025/2214)
# ---------------------------------------------------------------------------


def split_extended_lut(ext_lut, ext_factor: int):
    """(B, k+1, N*E) -> (B, E, k+1, N): small LUT j takes coefficients
    j, j+E, j+2E, ... (lwe_extended_programmable_bootstrapping.rs:72-85)."""
    b, k1, n_ext = ext_lut.shape
    n = n_ext // ext_factor
    y = ext_lut.reshape(b, k1, n, ext_factor)
    return jnp.transpose(y, (0, 3, 1, 2))


def extended_blind_rotate(msed_mask, msed_body, ext_lut, bsk_mont, plan,
                          base_log: int, levels: int, ext_factor: int,
                          bits: int = 64):
    """Blind rotation of a size-N*E LUT with a size-N bootstrap key.

    msed_mask: (B, n) u64 in [0, 2*N*E); msed_body: (B,) u64;
    ext_lut: (B, k+1, N*E) u64; bsk_mont: (n, l, k+1, k+1, P, N) u32.

    The extended accumulator lives as E interleaved small GLWEs (slot axis).
    Each step rotates the slot ring: slot j receives slot (j - a_i) mod E
    rotated by X^((E + a_i - 1 - j) / E), then one batched CMux advances all
    slots (lwe_extended_programmable_bootstrapping.rs:338-418).  Returns the
    final slot-0 accumulator (B, k+1, N); sample-extract its coefficient 0.
    """
    assert ext_factor & (ext_factor - 1) == 0, "extension factor power of 2"
    log_e = int(ext_factor).bit_length() - 1
    b = ext_lut.shape[0]
    k1 = ext_lut.shape[1]
    n = ext_lut.shape[2] // ext_factor

    acc_ext = srv.monomial_div(ext_lut, msed_body[:, None, None])
    acc = split_extended_lut(acc_ext, ext_factor)            # (B, E, k+1, N)
    slots = jnp.arange(ext_factor, dtype=jnp.int64)

    def step(acc, xs):
        a_i, ggsw = xs                                       # a_i: (B,)
        ai = a_i.astype(jnp.int64)
        src = jnp.mod(slots[None, :] - ai[:, None], ext_factor)   # (B, E)
        gathered = jnp.take_along_axis(
            acc, src.astype(jnp.int32)[:, :, None, None], axis=1)
        deg = ((ext_factor + ai[:, None] - 1 - slots[None, :])
               >> log_e).astype(U64)                          # (B, E)
        rotated = srv.monomial_mul(gathered, deg[:, :, None, None])
        ct1 = (rotated - acc).reshape(b * ext_factor, k1, n)
        prod = srv.external_product_ntt(ct1, ggsw, plan, base_log, levels,
                                        bits)
        return acc + prod.reshape(b, ext_factor, k1, n), None

    acc, _ = jax.lax.scan(step, acc, (msed_mask.T, bsk_mont))
    return acc[:, 0]


def extended_pbs_batch(ct, ext_lut, bsk_mont, plan, base_log: int,
                       levels: int, ext_factor: int, bits: int = 64):
    """Full extended PBS: modulus switch to 2*N*E, extended blind rotate,
    sample extract at 0 (lwe_extended_programmable_bootstrapping.rs:165).

    ct: (B, n+1) u64; ext_lut: (B, k+1, N*E) u64 (trivial accumulator).
    Returns (B, k*N+1) u64 under the flattened GLWE key.
    """
    n_ext = ext_lut.shape[2]
    log_mod = int(2 * n_ext).bit_length() - 1
    msed = srv.modulus_switch(ct, log_mod, bits)
    acc = extended_blind_rotate(msed[:, :-1], msed[:, -1], ext_lut, bsk_mont,
                                plan, base_log, levels, ext_factor, bits)
    return srv.sample_extract(acc)
