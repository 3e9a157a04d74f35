"""WoPBS: circuit bootstrapping + vertical packing (large-LUT evaluation).

Mirrors core_crypto/algorithms/lwe_wopbs.rs + shortint/wopbs/ (the
experimental big-LUT path): message bits are extracted as boolean LWEs,
circuit-bootstrapped into GGSWs via per-level PBS followed by private
functional packing keyswitches (one per GLWE row), and a 2^kappa-entry LUT
is evaluated by a GGSW-driven CMux tree + sample extraction.  All CMux
external products run through the exact CRT-NTT engine.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.encrypt import encrypt_glwe_assign
from ..core.params import DecompParams
from ..ops import ntt, server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator
from .ciphertext import NOMINAL_NOISE, Ciphertext
from .client_key import ClientKey
from .server_key import ServerKey


@dataclass(frozen=True)
class WopbsParams:
    """shortint/parameters/parameters_wopbs*.rs essentials."""

    cbs_base_log: int
    cbs_level: int
    pfks_base_log: int
    pfks_level: int


# Decomposition budgets sized so the CMux-tree error stays well under
# delta/2: pfks rep 40 bits (GGSW noise ~2^29), cbs digits <= 2^5 so each
# external product contributes ~2^45 against the 2^58 threshold.
TEST_WOPBS_PARAM = WopbsParams(cbs_base_log=6, cbs_level=4,
                               pfks_base_log=20, pfks_level=2)


def _cbs_log_shift(params: WopbsParams, l: int) -> int:
    """Scale exponent for GGSW slot l (pairs with decomposition level L-l)."""
    return params.cbs_base_log * (params.cbs_level - l)


WopbsParams.cbs_log_shift = lambda self, l: _cbs_log_shift(self, l)


class WopbsKey:
    """Circuit-bootstrap key material: one private functional packing
    keyswitch key per output GLWE row (lwe_wopbs.rs pfpksk_list)."""

    def __init__(self, client_key: ClientKey, server_key: ServerKey,
                 params: WopbsParams = TEST_WOPBS_PARAM, seed: int | None = None):
        p = client_key.params
        self.params = params
        self.shortint_params = p
        self.server_key = server_key
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0x30B5))
        glwe_sk = client_key.glwe_secret_key
        in_sk = client_key.big_lwe_secret_key  # PBS outputs live under the big key
        k = glwe_sk.glwe_dimension
        n_poly = glwe_sk.polynomial_size
        n_in = in_sk.dimension
        L = params.pfks_level
        plan = ntt.make_plan(n_poly, 4)
        self.plan = plan
        # pfpksk[r]: (n_in + 1, L, k+1, P, N) NTT Montgomery; entry (j, l)
        # encrypts p_r(X) * s_in_j * q/B^(l+1) (last j: p_r(X) * q/B^(l+1))
        # with p_r = -s_r(X) for r < k and p_k = 1.
        keys = []
        M = 1 << 64
        for r in range(k + 1):
            if r < k:
                p_poly = (-glwe_sk.data[r].astype(np.int64)).astype(np.uint64)
            else:
                p_poly = np.zeros(n_poly, dtype=np.uint64)
                p_poly[0] = 1
            mat = np.zeros((n_in + 1, L, k + 1, n_poly), dtype=np.uint64)
            for j in range(n_in + 1):
                s_j = int(in_sk.data[j]) if j < n_in else 1
                for l in range(L):
                    # storage slot l pairs with decomposition digit l, which
                    # is level (L - l): smallest scale first (decomposer.rs)
                    shift = 64 - params.pfks_base_log * (L - l)
                    factor = (s_j << shift) % M
                    with np.errstate(over="ignore"):
                        body = p_poly * np.uint64(factor)
                    ct = encrypt_glwe_assign(glwe_sk, body, p.glwe_noise, gen, p.bits)
                    mat[j, l] = ct.data
            with np.errstate(over="ignore"):
                fwd = ntt.forward_all(mat, plan, np)
                keys.append(jnp.asarray(ntt.to_mont_all(fwd, plan, np).astype(np.uint32)))
        self.pfpksk = keys  # list of k+1 arrays
        self.k = k
        self.n_poly = n_poly

    # ------------------------------------------------------------------
    # private functional packing keyswitch (one LWE -> one GLWE row)
    # ------------------------------------------------------------------

    def _pfpks(self, lwe: np.ndarray, r: int) -> jnp.ndarray:
        """out = sum_l decomp_l(b)*key[n] - sum_j sum_l decomp_l(a_j)*key[j],
        i.e. GLWE(p_r(X) * x) for the LWE's plaintext x."""
        params = self.params
        plan = self.plan
        key = self.pfpksk[r].astype(jnp.uint64)  # (n+1, L, k1, P, N)
        vals = jnp.asarray(lwe)  # (n+1,) u64: a_0..a_{n-1}, b
        digits = srv.signed_decompose(vals, params.pfks_base_log,
                                      params.pfks_level)  # (L, n+1)
        res = srv._digits_to_residues(digits, plan)       # (L, P, n+1)
        scal = jnp.transpose(res, (0, 2, 1))              # (L, n+1, P)
        key_t = jnp.transpose(key, (1, 0, 2, 3, 4))       # (L, n+1, k1, P, N)
        # REDC(scalar_residue * key_mont) = scalar * key in the normal domain
        prods = ntt.pointwise_mul_mont_stacked(
            scal[:, :, None, :, None], key_t, plan, jnp)  # (L, n+1, k1, P, N)
        # b term (j = n) positive, key-element terms negative
        ps = jnp.asarray(plan.ps)                         # (P, 1)
        neg = ps - prods
        terms = jnp.concatenate([neg[:, :-1], prods[:, -1:]], axis=1)
        total = ntt.lazy_reduce_stacked(jnp.sum(terms, axis=(0, 1)), plan, jnp)
        coeffs = ntt.ntt_inverse_stacked(total, plan, jnp)
        return ntt.garner_to_u64(coeffs, plan, jnp)  # (k1, N)

    # ------------------------------------------------------------------
    # circuit bootstrap: boolean LWE -> NTT-domain GGSW
    # ------------------------------------------------------------------

    def circuit_bootstrap_bits(self, ct_bits: list) -> list:
        """Batched CBS: the per-level PBS runs once over ALL bits, PFPKS per
        (bit, level, row).  Returns one NTT-domain GGSW per input bit."""
        sk = self.server_key
        params = self.params
        L = params.cbs_level
        nb = len(ct_bits)
        luts = []
        for l in range(L):
            shift = 64 - params.cbs_log_shift(l)
            luts.append(self._bit_lut(1 << shift))
        outs = []
        for l in range(L):
            outs.append(sk.apply_lookup_table_batch(ct_bits, luts[l]))
        ggsws = []
        for b in range(nb):
            rows = []
            for l in range(L):
                lwe = np.asarray(outs[l][b].data)
                rows.append(np.stack([np.asarray(self._pfpks(lwe, r))
                                      for r in range(self.k + 1)]))
            ggsw = np.stack(rows)
            with np.errstate(over="ignore"):
                fwd = ntt.forward_all(ggsw, self.plan, np)
                ggsws.append(jnp.asarray(
                    ntt.to_mont_all(fwd, self.plan, np).astype(np.uint32)))
        return ggsws

    def circuit_bootstrap_bit(self, ct_bit: Ciphertext) -> jnp.ndarray:
        """GGSW(bit) as (L_cbs, k+1, k+1, P, N) u32 Montgomery NTT domain
        (lwe_wopbs.rs circuit_bootstrap_boolean)."""
        sk = self.server_key
        p = self.shortint_params
        params = self.params
        L = params.cbs_level
        # per level: PBS the bit to LWE(bit * q / B^(l+1))
        lwes = []
        for l in range(L):
            # GGSW slot l pairs with digit l = decomposition level (L - l)
            shift = 64 - params.cbs_base_log * (L - l)
            lut = self._bit_lut(1 << shift)
            out = sk.apply_lookup_table_batch([ct_bit], lut)
            lwes.append(np.asarray(out[0].data))
        rows = []
        for l in range(L):
            row = [np.asarray(self._pfpks(lwes[l], r)) for r in range(self.k + 1)]
            rows.append(np.stack(row))  # (k+1, k1, N)
        ggsw = np.stack(rows)  # (L, k+1, k+1, N)
        with np.errstate(over="ignore"):
            fwd = ntt.forward_all(ggsw, self.plan, np)
            return jnp.asarray(ntt.to_mont_all(fwd, self.plan, np).astype(np.uint32))

    def _bit_lut(self, scale: int):
        """LUT mapping a {0,1}-encoded shortint (bit at delta) to bit*scale
        on the raw torus.  Builds the accumulator directly (no delta
        re-encoding) — f(x) = x * scale for the two boxes."""
        from .server_key import LookupTable

        p = self.shortint_params
        n = p.polynomial_size
        total = p.total_modulus
        box = n // total
        acc = np.zeros(n, dtype=np.uint64)
        M = (1 << 64) - 1
        for i in range(total):
            acc[i * box : (i + 1) * box] = ((i & 1) * scale) & M
        half_box = box // 2
        acc[:half_box] = (-acc[:half_box].astype(np.int64)).astype(np.uint64)
        acc = np.roll(acc, -half_box)
        out = np.zeros((p.glwe_dimension + 1, n), dtype=np.uint64)
        out[-1] = acc
        return LookupTable(out, degree=1)

    # ------------------------------------------------------------------
    # vertical packing: GGSW-driven LUT evaluation
    # ------------------------------------------------------------------

    def _cmux(self, ggsw, ct0, ct1):
        """ct0 + EP(ggsw, ct1 - ct0), batched shapes (1, k1, N)."""
        diff = ct1 - ct0
        prod = srv.external_product_ntt(diff, ggsw, self.plan,
                                        self.params.cbs_base_log,
                                        self.params.cbs_level)
        return ct0 + prod

    def vertical_packing(self, ggsw_bits: list, lut_values: list,
                         delta: int) -> Ciphertext:
        """Evaluate a 2^kappa-entry LUT; ggsw_bits MSB first
        (fft64/crypto/wop_pbs.rs vertical_packing)."""
        p = self.shortint_params
        n = self.n_poly
        kappa = len(ggsw_bits)
        size = 1 << kappa
        M = (1 << 64) - 1
        entries = [(int(lut_values[i]) * delta) & M for i in range(size)]
        n_polys = max(1, size // n)
        polys = []
        for t in range(n_polys):
            poly = np.zeros((p.glwe_dimension + 1, n), dtype=np.uint64)
            chunk = entries[t * n : (t + 1) * n]
            poly[-1, : len(chunk)] = chunk
            polys.append(jnp.asarray(poly)[None])
        # CMux tree over the high bits collapses the polynomial list
        tree_bits = ggsw_bits[: max(0, kappa - (n.bit_length() - 1))]
        for bit in tree_bits:  # MSB selects the upper half of the table
            half = len(polys) // 2
            polys = [self._cmux(bit, polys[i], polys[i + half])
                     for i in range(half)]
        acc = polys[0]
        # blind rotation by the low bits: bit i selects rotation by 2^i slots
        low_bits = ggsw_bits[len(tree_bits):]
        n_low = len(low_bits)
        for i, bit in enumerate(low_bits):  # MSB of the low group first
            rot = 1 << (n_low - 1 - i)
            rotated = srv.monomial_div(acc, jnp.full((1, 1, 1), rot, jnp.uint64))
            acc = self._cmux(bit, acc, rotated)
        lwe = np.asarray(srv.sample_extract(acc))[0]
        return Ciphertext(lwe, degree=p.message_modulus - 1, noise_level=NOMINAL_NOISE,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus)

    # ------------------------------------------------------------------
    # the full WoPBS: arbitrary LUT over the full (msg x carry) space
    # ------------------------------------------------------------------

    def extract_bits(self, ct: Ciphertext, num_bits: int) -> list:
        """Bits of the value, MSB first, each a {0,1} shortint (1 batched
        PBS round — the TPU replacement for the sequential extract_bits of
        lwe_wopbs.rs)."""
        sk = self.server_key
        luts = [sk.generate_lookup_table(lambda x, j=j: (x >> j) & 1)
                for j in range(num_bits - 1, -1, -1)]
        return sk.apply_lookup_table_batch([ct] * num_bits, luts)

    def apply_wopbs(self, ct: Ciphertext, f, num_bits: int | None = None) -> Ciphertext:
        """LUT of f over 2^num_bits inputs via extract-bits -> CBS -> VP."""
        p = self.shortint_params
        if num_bits is None:
            num_bits = (p.total_modulus - 1).bit_length()
        bits = self.extract_bits(ct, num_bits)
        ggsws = [self.circuit_bootstrap_bit(b) for b in bits]
        lut_values = [int(f(x)) % p.total_modulus for x in range(1 << num_bits)]
        return self.vertical_packing(ggsws, lut_values, p.delta)
