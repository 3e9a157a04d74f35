"""Multi-bit programmable bootstrapping.

Math (lwe_multi_bit_programmable_bootstrapping.rs:30-65 +
lwe_multi_bit_bootstrap_key_generation.rs:504-530 combine_key_bits): for a
group of g secret bits, the BSK stores one GGSW per INDICATOR pattern u —
GGSW(prod_i (s_i if bit_i(u) else 1-s_i)), exactly one of which encrypts 1
(the one matching the secret pattern).  At rotation time the effective GGSW
is sum_u X^{d_u} E_u with pure MONOMIAL weights, d_u = modulus_switch(sum of
the u-selected RAW mask elements) — ONE modulus-switch rounding per subset
(selection bits are big-endian: the group's first mask element maps to the
most significant bit of u, matching the reference).  A single external
product advances the accumulator — n/g steps instead of n.

The indicator convention matters for noise: monomial weights contribute
2^g * var_bsk per group (the reference's multi-bit noise formula), whereas
the subset-PRODUCT convention with prod(X^{a_i}-1) weights would pay
sum_V 2^|V| = 3^g (measured and rejected; see
tests/test_multibit_fused.py noise chain).

TPU mapping: monomial evaluation is a table gather
(NTT(X^d)[t] = psi^{(2 br(t)+1) d}) and the per-group combination a batched
weighted sum — all VPU-friendly; the reference's ThreadCount worker pool
(P3 in SURVEY §2.13) is absorbed by the batch dimension.  The fused MXU
kernel (ops/pallas_mxu.build_blind_rotate_v9) instead moves each monomial
onto the data side: acc <- sum_u contract(E_u, decompose(X^{d_u} * acc)).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ops import ntt
from ..utils.csprng import EncryptionRandomGenerator
from .encrypt import encrypt_glwe_assign
from .entities import GlweSecretKey, LweSecretKey
from .keygen import _ggsw_factor
from .params import DecompParams


def generate_multibit_bootstrap_key(
    input_sk: LweSecretKey,
    glwe_sk: GlweSecretKey,
    decomp: DecompParams,
    grouping_factor: int,
    noise_distribution,
    gen: EncryptionRandomGenerator,
    bits: int = 64,
) -> np.ndarray:
    """Returns (n/g, 2^g, l, k+1, k+1, N) standard-domain multi-bit BSK.

    Pattern index u selects, big-endian over the group's key bits (the
    group's first bit is u's MSB — combine_key_bits,
    lwe_multi_bit_bootstrap_key_generation.rs:504), the indicator plaintext
    prod_i (s_i if selected else 1 - s_i): u = 0 encrypts
    prod_i (1 - s_i), u = 2^g - 1 encrypts prod_i s_i, and exactly one
    pattern per group encrypts 1.
    """
    g = grouping_factor
    n_in = input_sk.dimension
    assert n_in % g == 0, "lwe_dimension must be divisible by grouping_factor"
    k = glwe_sk.glwe_dimension
    n_poly = glwe_sk.polynomial_size
    levels = decomp.level_count
    k1 = k + 1
    out = np.zeros((n_in // g, 1 << g, levels, k1, k1, n_poly), dtype=np.uint64)
    for j in range(n_in // g):
        bits_g = [int(input_sk.data[g * j + i]) for i in range(g)]
        for u in range(1 << g):
            cleartext = 1
            for i in range(g):
                sel = (u >> (g - 1 - i)) & 1
                cleartext *= bits_g[i] if sel else 1 - bits_g[i]
            ggsw_gens = gen.fork(levels, k1 * k * n_poly, k1 * n_poly,
                                 noise_distribution, bits)
            for lev_idx in range(levels):
                level = levels - lev_idx
                factor = _ggsw_factor(cleartext, level, decomp.base_log, bits)
                row_gens = ggsw_gens[lev_idx].fork(k1, k * n_poly, n_poly,
                                                   noise_distribution, bits)
                for r in range(k1):
                    body = np.zeros(n_poly, dtype=np.uint64)
                    if r < k1 - 1:
                        body = glwe_sk.data[r].astype(np.uint64) * np.uint64(factor)
                    else:
                        body[0] = (-factor) % (1 << bits)
                    ct = encrypt_glwe_assign(glwe_sk, body, noise_distribution,
                                             row_gens[r], bits)
                    out[j, u, lev_idx, r] = ct.data
    return out


def multibit_bsk_to_ntt(bsk: np.ndarray, num_primes: int = 4):
    n_poly = bsk.shape[-1]
    plan = ntt.make_plan(n_poly, num_primes)
    fwd = ntt.forward_all(bsk.astype(np.uint64), plan, np)
    return ntt.to_mont_all(fwd, plan, np).astype(np.uint32), plan


@lru_cache(maxsize=None)
def monomial_ntt_tables(n: int, num_primes: int = 4):
    """(psi_pows_mont (P, 4N) u64, bitrev (N,) i32): NTT(X^a)[t] =
    psi^{(2 br(t) + 1) a mod 4N} in Montgomery form."""
    plan = ntt.make_plan(n, num_primes)
    br = np.zeros(n, dtype=np.int32)
    bits_n = n.bit_length() - 1
    idx = np.arange(n)
    for b in range(bits_n):
        br |= (((idx >> b) & 1) << (bits_n - 1 - b)).astype(np.int32)
    tables = []
    for pi in range(num_primes):
        p = int(plan.plans[pi].p)
        g = ntt._find_generator(p)
        psi = ntt._pow_mod(g, (p - 1) // (2 * n), p)
        # must match the plan's psi (same generator search) — sanity check
        r = (1 << 32) % p
        pows = np.zeros(4 * n, dtype=np.uint64)
        acc = 1
        for e in range(4 * n):
            pows[e] = (acc * r) % p
            acc = (acc * psi) % p
        tables.append(pows)
    return np.stack(tables), br
