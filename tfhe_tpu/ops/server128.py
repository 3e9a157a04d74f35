"""u128-torus device pipeline: PBS128 for noise squashing.

The reference's 128-bit PBS (algorithms/lwe_programmable_bootstrapping/
fft128_pbs.rs) runs split-double f64 FFTs with a 104-bit effective mantissa;
here the exact CRT-NTT engine covers the u128 torus with 6 primes (185 bits
exceeds the 2^166 external-product bound for N=2048, l=3, base 24), so the
TPU path is exact.  u128 tensors travel as (lo, hi) u64 array pairs — JAX
has no u128 dtype and the TPU emulates u64 with u32 lanes anyway.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt
from .server import _roll_right, modulus_switch

U64 = jnp.uint64


# ---------------------------------------------------------------------------
# u64-pair helpers (static shift amounts)
# ---------------------------------------------------------------------------


def _shr128(lo, hi, s: int):
    """Logical right shift of a pair by static 0 <= s < 128."""
    if s == 0:
        return lo, hi
    if s < 64:
        return (lo >> np.uint64(s)) | (hi << np.uint64(64 - s)), hi >> np.uint64(s)
    if s == 64:
        return hi, jnp.zeros_like(hi)
    return hi >> np.uint64(s - 64), jnp.zeros_like(hi)


def _sar128(lo, hi, s: int):
    """Arithmetic right shift of a pair by static 0 <= s < 64."""
    if s == 0:
        return lo, hi
    new_lo = (lo >> np.uint64(s)) | (hi << np.uint64(64 - s))
    new_hi = (hi.astype(jnp.int64) >> np.int64(s)).astype(U64)
    return new_lo, new_hi


def _shl128(lo, hi, s: int):
    if s == 0:
        return lo, hi
    if s < 64:
        return lo << np.uint64(s), (hi << np.uint64(s)) | (lo >> np.uint64(64 - s))
    return jnp.zeros_like(lo), lo << np.uint64(s - 64)


def _bit128(lo, hi, i: int):
    """Bit i of the pair, as u64 0/1."""
    if i < 64:
        return (lo >> np.uint64(i)) & np.uint64(1)
    return (hi >> np.uint64(i - 64)) & np.uint64(1)


def _mask128(lo, hi, nbits: int):
    """Keep the low nbits of the pair."""
    if nbits >= 128:
        return lo, hi
    if nbits > 64:
        return lo, hi & np.uint64((1 << (nbits - 64)) - 1)
    if nbits == 64:
        return lo, jnp.zeros_like(hi)
    return lo & np.uint64((1 << nbits) - 1), jnp.zeros_like(hi)


# ---------------------------------------------------------------------------
# Signed gadget decomposition on the u128 torus
# ---------------------------------------------------------------------------


def signed_decompose128(lo, hi, base_log: int, levels: int):
    """decomposer.rs semantics on 128-bit values; digits returned as
    sign-wrapped (lo, hi) pairs with |digit| <= B/2 (level l first)."""
    rep = base_log * levels
    assert rep < 128 and base_log <= 63
    nonrep = 128 - rep
    r_lo, r_hi = _shr128(lo, hi, nonrep - 1)
    rounding = r_lo & np.uint64(1)
    # (res + 1) >> 1
    one = jnp.ones_like(r_lo)
    zero = jnp.zeros_like(r_lo)
    r_lo, r_hi = ntt.add128(r_lo, r_hi, one, zero, jnp)
    r_lo, r_hi = _shr128(r_lo, r_hi, 1)
    r_lo, r_hi = _mask128(r_lo, r_hi, rep)
    # need-balance bit: (((res - 1) | (rounding << (rep-1))) & res) >> (rep-1)
    rm1_lo, rm1_hi = ntt.sub128(r_lo, r_hi, one, zero, jnp)
    rb_lo, rb_hi = _shl128(rounding, zero, rep - 1)
    t_lo, t_hi = rm1_lo | rb_lo, rm1_hi | rb_hi
    u_lo, u_hi = t_lo & r_lo, t_hi & r_hi
    nb = _bit128(u_lo, u_hi, rep - 1)
    nb_lo, nb_hi = _shl128(nb, zero, rep)
    s_lo, s_hi = ntt.sub128(r_lo, r_hi, nb_lo, nb_hi, jnp)

    mask = np.uint64((1 << base_log) - 1)
    digits = []
    for _ in range(levels):
        d = s_lo & mask
        s_lo, s_hi = _sar128(s_lo, s_hi, base_log)
        carry = (((d - np.uint64(1)) | s_lo) & d) >> np.uint64(base_log - 1)
        s_lo, s_hi = ntt.add128(s_lo, s_hi, carry, jnp.zeros_like(carry), jnp)
        c_lo, c_hi = _shl128(carry, jnp.zeros_like(carry), base_log)
        d_lo, d_hi = ntt.sub128(d, jnp.zeros_like(d), c_lo, c_hi, jnp)
        digits.append((d_lo, d_hi))
    return digits


def _digit_residues128(d_lo, d_hi, plan):
    """Sign-wrapped digits (|d| < 2^63) -> per-prime residues.  Digits may
    exceed the 31-bit primes (e.g. the base-61 packing keyswitch), so the
    magnitude is reduced mod p."""
    neg = d_hi >> np.uint64(63)
    mag = jnp.where(neg.astype(bool), jnp.zeros_like(d_lo) - d_lo, d_lo)
    outs = []
    for i in range(plan.num_primes):
        p = plan.plans[i].p
        m = mag % p
        outs.append(jnp.where(neg.astype(bool) & (m != 0), p - m, m))
    return jnp.stack(outs, axis=-2)


# ---------------------------------------------------------------------------
# Negacyclic monomial rotations on pairs
# ---------------------------------------------------------------------------


def monomial_mul128(lo, hi, degree):
    """poly * X^degree (negacyclic), degree (traced) in [0, 2N)."""
    n = lo.shape[-1]
    cycles = degree // n
    r = degree % n
    rl = _roll_right(lo, r)
    rh = _roll_right(hi, r)
    idx = jax.lax.broadcasted_iota(jnp.int64, lo.shape, lo.ndim - 1)
    flip = (idx < r.astype(jnp.int64)) ^ ((cycles % 2) == 1)
    nl, nh = ntt.neg128(rl, rh, jnp)
    return jnp.where(flip, nl, rl), jnp.where(flip, nh, rh)


def monomial_div128(lo, hi, degree):
    n = lo.shape[-1]
    cycles = degree // n
    r = degree % n
    rl = _roll_right(lo, (n - r) % n)
    rh = _roll_right(hi, (n - r) % n)
    idx = jax.lax.broadcasted_iota(jnp.int64, lo.shape, lo.ndim - 1)
    flip = ((idx >= (n - r).astype(jnp.int64) % n) & (r != 0)) ^ ((cycles % 2) == 1)
    nl, nh = ntt.neg128(rl, rh, jnp)
    return jnp.where(flip, nl, rl), jnp.where(flip, nh, rh)


# ---------------------------------------------------------------------------
# External product & blind rotate over u128
# ---------------------------------------------------------------------------


def external_product128(g_lo, g_hi, bsk_ggsw_mont, plan, base_log: int, levels: int):
    """GGSW (x) GLWE over the u128 torus; returns the (lo, hi) product."""
    digits = signed_decompose128(g_lo, g_hi, base_log, levels)
    key = bsk_ggsw_mont.astype(U64)  # (l, k+1, k+1, P, N)
    acc = None
    fwd = []
    for lev in range(levels):
        res = _digit_residues128(*digits[lev], plan)
        fwd.append(ntt.ntt_forward_stacked(res, plan, jnp))  # (B, k+1, P, N)
    k1 = key.shape[1]
    for lev in range(levels):
        for r in range(k1):
            prod = ntt.pointwise_mul_mont_stacked(
                fwd[lev][:, r, None, :, :], key[lev][r][None, :, :, :], plan, jnp)
            acc = prod if acc is None else ntt.add_mod_stacked(acc, prod, plan, jnp)
    coeffs = ntt.ntt_inverse_stacked(acc, plan, jnp)
    return ntt.garner_to_u128(coeffs, plan, jnp)


def blind_rotate128(msed_mask, msed_body, lut_lo, lut_hi, bsk_mont, plan,
                    base_log: int, levels: int):
    """Batched 128-bit blind rotation (fft128_pbs.rs analog, exact)."""
    acc_lo, acc_hi = monomial_div128(lut_lo, lut_hi, msed_body[:, None, None])

    def step(carry, xs):
        a_lo, a_hi = carry
        a_i, ggsw = xs
        r_lo, r_hi = monomial_mul128(a_lo, a_hi, a_i[:, None, None])
        c_lo, c_hi = ntt.sub128(r_lo, r_hi, a_lo, a_hi, jnp)
        p_lo, p_hi = external_product128(c_lo, c_hi, ggsw, plan, base_log, levels)
        return ntt.add128(a_lo, a_hi, p_lo, p_hi, jnp), None

    (acc_lo, acc_hi), _ = jax.lax.scan(step, (acc_lo, acc_hi),
                                       (msed_mask.T, bsk_mont))
    return acc_lo, acc_hi


def blind_rotate128_pallas(msed_mask, msed_body, lut_lo, lut_hi, bsk_mont,
                           plan, base_log: int, levels: int, tb: int = 32,
                           interpret: bool = False):
    """128-bit blind rotation through the fused quad-word Pallas kernel
    (pallas_ntt.build_blind_rotate_v2q) — bit-identical to blind_rotate128.
    interpret=True runs the kernel through the Pallas interpreter on CPU."""
    from . import pallas_ntt

    b, k1, n = lut_lo.shape
    n_in = bsk_mont.shape[0]
    acc_lo, acc_hi = monomial_div128(lut_lo, lut_hi, msed_body[:, None, None])
    m32 = np.uint64(0xFFFFFFFF)
    words = [
        (acc_lo & m32).astype(jnp.uint32),
        (acc_lo >> np.uint64(32)).astype(jnp.uint32),
        (acc_hi & m32).astype(jnp.uint32),
        (acc_hi >> np.uint64(32)).astype(jnp.uint32),
    ]
    words = [pallas_ntt.to_chunk_layout(w, k1, n) for w in words]
    bsk_c = bsk_mont.reshape(*bsk_mont.shape[:-1], n // 128, 128)
    run = pallas_ntt.build_blind_rotate_v2q(
        n, plan.num_primes, base_log, levels, k1, tb, n_in, interpret)
    ws = run(*words, msed_mask.T.astype(jnp.int32), bsk_c)
    ws = [pallas_ntt.from_chunk_layout(w, b, k1, n).astype(U64) for w in ws]
    out_lo = ws[0] | (ws[1] << np.uint64(32))
    out_hi = ws[2] | (ws[3] << np.uint64(32))
    return out_lo, out_hi


def sample_extract128(g_lo, g_hi):
    """Constant-coefficient extraction; returns (B, k*N+1) pairs."""
    b, glwe_size, n = g_lo.shape
    m_lo = g_lo[:, :-1, :]
    m_hi = g_hi[:, :-1, :]
    f_lo, f_hi = ntt.neg128(jnp.flip(m_lo, axis=-1), jnp.flip(m_hi, axis=-1), jnp)
    r_lo = jnp.roll(f_lo, 1, axis=-1).at[:, :, 0].set(m_lo[:, :, 0])
    r_hi = jnp.roll(f_hi, 1, axis=-1).at[:, :, 0].set(m_hi[:, :, 0])
    out_lo = jnp.concatenate([r_lo.reshape(b, -1), g_lo[:, -1, 0][:, None]], axis=-1)
    out_hi = jnp.concatenate([r_hi.reshape(b, -1), g_hi[:, -1, 0][:, None]], axis=-1)
    return out_lo, out_hi


@partial(jax.jit, static_argnames=("ks_base_log", "ks_levels", "pbs_base_log",
                                   "pbs_levels", "plan", "plan128",
                                   "use_pallas", "pallas_tb",
                                   "pallas_interpret"))
def ks_pbs128_batch(ct, lut_lo, lut_hi, ksk, bsk128_mont, plan, plan128,
                    ks_base_log: int, ks_levels: int,
                    pbs_base_log: int, pbs_levels: int,
                    use_pallas: bool = False, pallas_tb: int = 32,
                    pallas_interpret: bool = False):
    """Noise squashing pipeline: u64 KS -> MS -> 128-bit blind rotate -> SE.

    ct: (B, n_big+1) u64; lut pair: (B, k128+1, N128); ksk u64;
    bsk128_mont: (n_small, l, k128+1, k128+1, P128, N128) u32.
    Returns (lo, hi) of shape (B, k128*N128 + 1).
    """
    from .server import keyswitch

    n_poly = lut_lo.shape[-1]
    log_mod = n_poly.bit_length()
    ks = keyswitch(ct, ksk, ks_base_log, ks_levels, 64)
    body = modulus_switch(ks[:, -1], log_mod, 64)
    msed_mask = modulus_switch(ks[:, :-1], log_mod, 64)
    if use_pallas:
        a_lo, a_hi = blind_rotate128_pallas(
            msed_mask, body, lut_lo, lut_hi, bsk128_mont, plan128,
            pbs_base_log, pbs_levels, tb=pallas_tb,
            interpret=pallas_interpret)
    else:
        a_lo, a_hi = blind_rotate128(msed_mask, body, lut_lo, lut_hi,
                                     bsk128_mont, plan128, pbs_base_log,
                                     pbs_levels)
    return sample_extract128(a_lo, a_hi)


def generate_lut128(polynomial_size: int, glwe_size: int, cleartext_space: int,
                    delta128: int, f) -> tuple:
    """PBS LUT over the u128 torus as (lo, hi) numpy pair (trivial GLWE)."""
    n = polynomial_size
    box = n // cleartext_space
    m = (1 << 128) - 1
    acc = [0] * n
    for i in range(cleartext_space):
        v = (int(f(i)) * delta128) & m
        for j in range(i * box, (i + 1) * box):
            acc[j] = v
    half_box = box // 2
    for j in range(half_box):
        acc[j] = (-acc[j]) & m
    acc = acc[half_box:] + acc[:half_box]  # roll left by half_box
    lo = np.array([x & ((1 << 64) - 1) for x in acc], dtype=np.uint64)
    hi = np.array([x >> 64 for x in acc], dtype=np.uint64)
    out_lo = np.zeros((glwe_size, n), dtype=np.uint64)
    out_hi = np.zeros((glwe_size, n), dtype=np.uint64)
    out_lo[-1] = lo
    out_hi[-1] = hi
    return out_lo, out_hi
