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

    @property
    def use_pallas(self) -> bool:
        """Fused quad-word (u128) Pallas blind rotate on real TPU; the XLA
        path stays for CPU tests and shapes the kernel does not cover."""
        import os

        import jax

        sp = self.params
        rep = sp.decomp_base_log * sp.decomp_level_count
        return (
            jax.default_backend() not in ("cpu",)
            and os.environ.get("TFHE_TPU_DISABLE_PALLAS") != "1"
            and sp.polynomial_size % 128 == 0
            and 32 < rep <= 96
            and sp.decomp_base_log <= 31
        )

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
        n = len(cts)
        use_pallas = self.use_pallas
        tb = min(32, n) if use_pallas else 32
        n_pad = n
        if use_pallas and n % tb != 0:
            n_pad = ((n + tb - 1) // tb) * tb
        rows = [np.asarray(c.data) for c in cts]
        rows += [rows[-1]] * (n_pad - n)
        batch = jnp.asarray(np.stack(rows))
        l_lo = jnp.asarray(np.broadcast_to(lut_lo, (n_pad,) + lut_lo.shape))
        l_hi = jnp.asarray(np.broadcast_to(lut_hi, (n_pad,) + lut_hi.shape))
        out_lo, out_hi = server128.ks_pbs128_batch(
            batch, l_lo, l_hi, server_key.ksk, self.bsk128_mont,
            server_key.plan, self.plan128,
            p.ks_base_log, p.ks_level, sp.decomp_base_log, sp.decomp_level_count,
            use_pallas=use_pallas, pallas_tb=tb)
        out_lo = np.asarray(out_lo)
        out_hi = np.asarray(out_hi)
        return [
            SquashedNoiseCiphertext(out_lo[i], out_hi[i], cts[i].degree,
                                    self.message_modulus, self.carry_modulus)
            for i in range(n)
        ]


# ---------------------------------------------------------------------------
# Noise-squashing compression: pack squashed (u128) LWEs into one GLWE via a
# u128 packing keyswitch (shortint/list_compression/noise_squashing_compression.rs,
# V1_4_NOISE_SQUASHING_COMP params: N=1024, k=6, base 61, level 1).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NoiseSquashingCompressionParams:
    packing_ks_level: int
    packing_ks_base_log: int
    packing_ks_polynomial_size: int
    packing_ks_glwe_dimension: int
    lwe_per_glwe: int
    packing_noise_bound_log2: int


V1_4_NOISE_SQUASHING_COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = \
    NoiseSquashingCompressionParams(
        packing_ks_level=1, packing_ks_base_log=61,
        packing_ks_polynomial_size=1024, packing_ks_glwe_dimension=6,
        lwe_per_glwe=128, packing_noise_bound_log2=3)

TEST_NOISE_SQUASHING_COMP_PARAM = NoiseSquashingCompressionParams(
    packing_ks_level=1, packing_ks_base_log=61,
    packing_ks_polynomial_size=256, packing_ks_glwe_dimension=2,
    lwe_per_glwe=16, packing_noise_bound_log2=3)


@dataclass
class CompressedSquashedNoiseCiphertextList:
    glwe_lo: np.ndarray  # (k+1, N)
    glwe_hi: np.ndarray
    count: int
    message_modulus: int
    carry_modulus: int


class NoiseSquashingCompressionPrivateKey:
    def __init__(self, params: NoiseSquashingCompressionParams,
                 seed: int | None = None):
        from ..utils.csprng import SecretRandomGenerator

        self.params = params
        if seed is None:
            seed = secrets.randbits(128)
        sec = SecretRandomGenerator(seed ^ 0xC0123)
        self.glwe_secret_key = torus128.generate_binary_glwe_secret_key128(
            params.packing_ks_glwe_dimension, params.packing_ks_polynomial_size, sec)

    def decrypt_list(self, packed: CompressedSquashedNoiseCiphertextList) -> list:
        """Decrypt the packed GLWE and decode each slot's message."""
        sk = self.glwe_secret_key
        plan = ntt.make_plan(self.params.packing_ks_polynomial_size, 8)
        n = self.params.packing_ks_polynomial_size
        with np.errstate(over="ignore"):
            a_lo = packed.glwe_lo[-1].copy()
            a_hi = packed.glwe_hi[-1].copy()
            for i in range(sk.glwe_dimension):
                q_lo, q_hi = ntt.negacyclic_polymul_u128(
                    packed.glwe_lo[i], packed.glwe_hi[i], sk.data[i],
                    np.zeros(n, np.uint64), plan, np)
                a_lo, a_hi = ntt.sub128(a_lo, a_hi, q_lo, q_hi, np)
        total = packed.message_modulus * packed.carry_modulus
        bits = (total - 1).bit_length()
        out = []
        for j in range(packed.count):
            pt = int(a_lo[j]) | (int(a_hi[j]) << 64)
            out.append(torus128.decode128(pt, bits) % total)
        return out


class NoiseSquashingCompressionKey:
    """u128 packing keyswitch key from the squashing GLWE key (as LWE) to the
    packing GLWE key."""

    def __init__(self, squashing_private_key: NoiseSquashingPrivateKey,
                 comp_private_key: NoiseSquashingCompressionPrivateKey,
                 seed: int | None = None):
        sp = squashing_private_key.params
        cp = comp_private_key.params
        self.params = cp
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0xC0124))
        noise = TUniform(cp.packing_noise_bound_log2)
        in_bits = squashing_private_key.glwe_secret_key.to_lwe_key_bits()
        n_in = len(in_bits)
        n_out = cp.packing_ks_polynomial_size
        k_out = cp.packing_ks_glwe_dimension
        L = cp.packing_ks_level
        self.plan = ntt.make_plan(n_out, 8)
        M = 1 << 128
        pksk_lo = np.zeros((n_in, L, k_out + 1, n_out), dtype=np.uint64)
        pksk_hi = np.zeros_like(pksk_lo)
        for i in range(n_in):
            s_i = int(in_bits[i])
            for l in range(L):
                level = L - l  # slot l pairs with decomposition digit l
                shift = 128 - cp.packing_ks_base_log * level
                body_lo = np.zeros(n_out, dtype=np.uint64)
                body_hi = np.zeros(n_out, dtype=np.uint64)
                v = (s_i << shift) % M
                body_lo[0] = v & ((1 << 64) - 1)
                body_hi[0] = v >> 64
                lo, hi = torus128.encrypt_glwe_assign128(
                    comp_private_key.glwe_secret_key, body_lo, body_hi,
                    noise, gen, self.plan)
                pksk_lo[i, l], pksk_hi[i, l] = lo, hi
        with np.errstate(over="ignore"):
            self.pksk_mont = jnp.asarray(
                torus128.bootstrap_key128_to_ntt(pksk_lo, pksk_hi, self.plan))

    def compress(self, cts: list) -> CompressedSquashedNoiseCiphertextList:
        """Pack <= lwe_per_glwe squashed LWEs into one u128 GLWE: slot j of
        the output body carries ct_j's plaintext."""
        from ..ops import server128 as s128

        cp = self.params
        assert len(cts) <= min(cp.lwe_per_glwe, cp.packing_ks_polynomial_size)
        n_out = cp.packing_ks_polynomial_size
        n_in = len(cts[0].lo) - 1
        count = len(cts)
        # A_i(X): coefficient j = mask element i of ct j; B(X): bodies
        a_lo = np.zeros((n_in, n_out), dtype=np.uint64)
        a_hi = np.zeros_like(a_lo)
        b_lo = np.zeros(n_out, dtype=np.uint64)
        b_hi = np.zeros(n_out, dtype=np.uint64)
        for j, ct in enumerate(cts):
            a_lo[:, j], a_hi[:, j] = ct.lo[:-1], ct.hi[:-1]
            b_lo[j], b_hi[j] = ct.lo[-1], ct.hi[-1]
        digits = s128.signed_decompose128(jnp.asarray(a_lo), jnp.asarray(a_hi),
                                          cp.packing_ks_base_log,
                                          cp.packing_ks_level)  # L x (n_in, N)
        plan = self.plan
        acc = None
        key = self.pksk_mont.astype(jnp.uint64)  # (n_in, L, k+1, P, N)
        for l, (d_lo, d_hi) in enumerate(digits):
            res = s128._digit_residues128(d_lo, d_hi, plan)   # (n_in, P, N)
            fwd = ntt.ntt_forward_stacked(res, plan, jnp)
            prod = ntt.pointwise_mul_mont_stacked(
                fwd[:, None, :, :], key[:, l], plan, jnp)     # (n_in, k+1, P, N)
            ssum = jnp.sum(prod, axis=0)
            acc = ssum if acc is None else acc + ssum
        total = ntt.lazy_reduce_stacked(acc, plan, jnp)
        coeffs = ntt.ntt_inverse_stacked(total, plan, jnp)
        s_lo, s_hi = ntt.garner_to_u128(coeffs, plan, jnp)    # (k+1, N)
        out_lo = np.array(jnp.zeros_like(s_lo) - s_lo)
        out_hi = np.array(
            jnp.where(s_lo == 0, jnp.zeros_like(s_hi) - s_hi, ~s_hi))
        with np.errstate(over="ignore"):
            new_body = out_lo[-1] + b_lo
            carry = new_body < out_lo[-1]
            out_lo[-1] = new_body
            out_hi[-1] = out_hi[-1] + b_hi + carry
        return CompressedSquashedNoiseCiphertextList(
            out_lo, out_hi, count, cts[0].message_modulus, cts[0].carry_modulus)
