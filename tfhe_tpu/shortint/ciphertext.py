"""shortint ciphertext with degree / noise-level metadata.

Mirrors shortint/ciphertext/standard.rs:20-29: the Degree (max reachable
plaintext value) and NoiseLevel (multiple of nominal fresh noise) ride along
with every ciphertext and drive the smart-op bootstrap decisions.  Metadata
lives host-side (plain ints) — device code never branches on it.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

NOMINAL_NOISE = 1


@dataclass
class Ciphertext:
    data: np.ndarray  # (n+1,) uint64 — LWE under the big key (KS->PBS order)
    degree: int
    noise_level: int
    message_modulus: int
    carry_modulus: int

    @property
    def lwe_dimension(self) -> int:
        return self.data.shape[-1] - 1

    def with_data(self, data, degree=None, noise_level=None) -> "Ciphertext":
        return Ciphertext(
            data=data,
            degree=self.degree if degree is None else degree,
            noise_level=self.noise_level if noise_level is None else noise_level,
            message_modulus=self.message_modulus,
            carry_modulus=self.carry_modulus,
        )

    def copy(self) -> "Ciphertext":
        return replace(self, data=np.array(self.data))
