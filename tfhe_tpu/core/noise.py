"""Closed-form noise-variance formulas and symbolic noise simulation.

Analog of core_crypto/commons/noise_formulas/ (SURVEY.md §2.2): per-primitive
output-noise variance used by the statistical test harness
(mean_and_variance_check) and by parameter validation.  Variances are in
absolute torus-squared units scaled to the ciphertext modulus q = 2^bits
(i.e. "modular variance" = Var * q^2 convention of the reference).

The NTT path is *exact*, so the FFT-mantissa error terms of the reference
(PBS_FFT_64_MANTISSA_SIZE = 53 in noise_simulation/mod.rs:29) vanish here:
TPU PBS noise = the pure algorithmic bound — strictly less noise than the
reference's f64-FFT backend for identical parameters.
"""

from __future__ import annotations

from dataclasses import dataclass

import math

from ..utils.csprng import Gaussian, TUniform


def distribution_variance(dist, bits: int) -> float:
    """Modular variance (in units of q^2-scaled torus) of a noise sample."""
    if isinstance(dist, Gaussian):
        return (dist.std * 2.0 ** bits) ** 2
    if isinstance(dist, TUniform):
        return (2.0 ** (2 * dist.bound_log2 + 1) + 1.0) / 6.0
    raise TypeError(dist)


def keyswitch_additive_variance(n_in: int, base_log: int, levels: int,
                                var_ksk: float, bits: int = 64) -> float:
    """Additive variance of an LWE keyswitch (binary keys).

    Two terms (lwe_keyswitch noise formula):
      - KSK noise accumulation: n_in * levels * (B^2+2)/12 * var_ksk
        (each KSK noise sample is scaled by a balanced digit with
        E[d^2] = (B^2+2)/12 — same factor as the external product)
      - decomposition rounding: n_in * (q^2 2^-2(b*l) - 1) / 12 * (1/2)
        (residual multiplies a binary key bit, E[s^2] = 1/2).

    Validated against measured production-parameter phases in
    tests/test_noise_pfail.py (the digit factor is invisible at toy
    parameters where the rounding term dominates).
    """
    b = 2.0 ** base_log
    b2l = 2.0 ** (bits - base_log * levels)
    rounding = n_in * (b2l ** 2 / 12.0 - 1.0 / 12.0) * 0.5
    key_noise = n_in * levels * (b * b + 2.0) / 12.0 * var_ksk
    return key_noise + rounding


def modulus_switch_additive_variance(n: int, log_modulus: int, bits: int = 64) -> float:
    """MS rounding variance: (n/2 + 1) * (2^(bits-log) )^2 / 12 (binary key)."""
    step = 2.0 ** (bits - log_modulus)
    return (n / 2.0 + 1.0) * (step ** 2) / 12.0 - (n / 2.0 + 1.0) / 12.0


def pbs_output_variance(n_in: int, glwe_dim: int, poly_size: int,
                        base_log: int, levels: int, var_bsk: float,
                        bits: int = 64) -> float:
    """Variance after a fresh (classic) PBS with an exact polynomial product.

    Standard external-product accumulation bound for binary GLWE keys
    (lwe_programmable_bootstrap formula, minus the FFT-error term which is
    zero on the exact NTT backend):
      n * [ l*(k+1)*N*(B^2+2)/12 * var_bsk
            + (q^2 B^-2l - 1)/24 * (1 + k*N/2)
            + k*N/32 * B^-2l ... ]  (small terms kept for fidelity)
    """
    k = glwe_dim
    n_poly = poly_size
    b = 2.0 ** base_log
    b2l = 2.0 ** (2 * base_log * levels)
    q2 = 2.0 ** (2 * bits)
    term_key = levels * (k + 1) * n_poly * (b * b + 2.0) / 12.0 * var_bsk
    term_round = (q2 / b2l - 1.0) / 24.0 * (1.0 + k * n_poly / 2.0)
    term_small = k * n_poly / 32.0 + 1.0 / 16.0 * (1.0 - k * n_poly / 2.0) ** 2 / b2l
    return n_in * (term_key + term_round + term_small)


@dataclass
class NoiseSimulationLwe:
    """Symbolic ciphertext: propagates variance instead of data
    (noise_simulation/mod.rs).  All variances are modular (q^2-scaled)."""

    lwe_dimension: int
    variance: float
    bits: int = 64

    @classmethod
    def encrypt(cls, dist, lwe_dimension: int, bits: int = 64):
        return cls(lwe_dimension, distribution_variance(dist, bits), bits)

    def add(self, other: "NoiseSimulationLwe") -> "NoiseSimulationLwe":
        return NoiseSimulationLwe(self.lwe_dimension, self.variance + other.variance, self.bits)

    def scalar_mul(self, scalar: int) -> "NoiseSimulationLwe":
        return NoiseSimulationLwe(self.lwe_dimension, self.variance * scalar * scalar, self.bits)

    def keyswitch(self, n_out: int, base_log: int, levels: int, ksk_dist) -> "NoiseSimulationLwe":
        var = self.variance + keyswitch_additive_variance(
            self.lwe_dimension, base_log, levels,
            distribution_variance(ksk_dist, self.bits), self.bits)
        return NoiseSimulationLwe(n_out, var, self.bits)

    def pbs(self, params) -> "NoiseSimulationLwe":
        """Fresh PBS output noise for BootstrapParams-like params."""
        var = pbs_output_variance(
            self.lwe_dimension, params.glwe_dimension, params.polynomial_size,
            params.pbs_decomp.base_log, params.pbs_decomp.level_count,
            distribution_variance(params.glwe.noise, self.bits), self.bits)
        return NoiseSimulationLwe(
            params.glwe_dimension * params.polynomial_size, var, self.bits)


def variance_to_std_log2(variance: float) -> float:
    return 0.5 * math.log2(variance) if variance > 0 else float("-inf")
