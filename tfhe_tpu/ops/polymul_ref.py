"""Exact schoolbook negacyclic polynomial multiplication (test oracle).

Arbitrary-precision (Python int) arithmetic; the analog of the reference's
deterministic Karatsuba path (karatsuba_pbs.rs) used to validate the CRT-NTT
engine bit-for-bit.  O(N^2) — tests only.
"""

from __future__ import annotations

import numpy as np


def negacyclic_polymul_exact(a: np.ndarray, b: np.ndarray, bits: int = 64) -> np.ndarray:
    """Negacyclic product mod 2^bits of two uint coefficient vectors."""
    n = len(a)
    ai = [int(x) for x in a]
    bi = [int(x) for x in b]
    out = [0] * n
    for i in range(n):
        if ai[i] == 0:
            continue
        for j in range(n):
            k = i + j
            if k < n:
                out[k] += ai[i] * bi[j]
            else:
                out[k - n] -= ai[i] * bi[j]
    mask = (1 << bits) - 1
    return np.array([x & mask for x in out], dtype=np.uint64)


def negacyclic_polymul_signed_exact(a_signed, b: np.ndarray, bits: int = 64) -> np.ndarray:
    """Same, with `a` given as signed Python ints (e.g. decomposition digits)."""
    n = len(a_signed)
    bi = [int(x) for x in b]
    out = [0] * n
    for i in range(n):
        if a_signed[i] == 0:
            continue
        for j in range(n):
            k = i + j
            if k < n:
                out[k] += int(a_signed[i]) * bi[j]
            else:
                out[k - n] -= int(a_signed[i]) * bi[j]
    mask = (1 << bits) - 1
    return np.array([x & mask for x in out], dtype=np.uint64)
