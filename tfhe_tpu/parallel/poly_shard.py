"""Intra-op polynomial-axis sharding: one huge-N negacyclic NTT spread
across the device mesh (SURVEY §2.13 P5).

The reference's CUDA analog is grid parallelism inside one GPU
(programmable_bootstrap_cg_classic.cuh:40 — grid over level x row x poly
chunk with grid-wide sync); across CHIPS there is no reference code to
port, so this is designed TPU-first: the four-step NTT factorization with
the transpose step as an ICI `all_to_all`.

Math (per prime p, root psi of order 2N, om = psi^2):
  coefficients strided over D devices: device a holds x[a + D*c], c<C=N/D.
  negacyclic twist psi^i = psi^a * (psi^D)^c is device-local;
  cyclic N-NTT factors as  X[k2 + C*k1] =
      sum_a (om^C)^(a*k1) * om^(a*k2) * CyclicNTT_C(x'_a)[k2]
  -> local cyclic-C transform (root om^D), local twiddle om^(a*k2),
     all_to_all over k2 blocks, local size-D transform (root om^C).
  The inverse mirrors each step.  Both operands of a product go through
  the SAME distributed forward, so the eval-domain layout (device b holds
  k2-block b, all k1) cancels out.

The local transforms run as explicit mod-p matmuls in Montgomery form
(exact; O(C) per coefficient).  For production N=2^13..2^16 a butterfly
local stage can replace them without touching the distributed structure —
the collectives and layouts are the load-bearing part validated here.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt

U64 = jnp.uint64


def _pow(b, e, p):
    return pow(int(b), int(e), int(p))


@lru_cache(maxsize=None)
def make_poly_shard_tables(n: int, n_dev: int, num_primes: int = 4):
    """Per-prime tables for the D-device four-step split of size-N.

    Returns a dict of numpy arrays; leading axis D = per-device (sharded
    into shard_map), no leading axis = replicated.  All matrices are in
    Montgomery form (mont_mul-ready).
    """
    plan = ntt.make_plan(n, num_primes)
    d, c = n_dev, n // n_dev
    assert n % n_dev == 0 and c >= 1
    out = {"plan": plan}
    tw_f, tw_i = [], []           # (D, P, C) twist+twiddle merged? kept apart
    vc_f, vc_i = [], []           # (P, C, C) local cyclic-C matrices
    vd_f, vd_i = [], []           # (P, D, D) cross transforms
    twd_f, twd_i = [], []         # (D, P, C) om^(a*k2) twiddles
    for pi, p in enumerate(plan.primes):
        g = ntt._find_generator(p)
        psi = _pow(g, (p - 1) // (2 * n), p)
        om = _pow(psi, 2, p)
        r = (1 << 32) % p
        psi_i = _pow(psi, p - 2, p)
        om_i = _pow(om, p - 2, p)
        omd, omdi = _pow(om, d, p), _pow(om_i, d, p)
        omc, omci = _pow(om, c, p), _pow(om_i, c, p)
        cinv = _pow(c, p - 2, p)
        dinv = _pow(d, p - 2, p)
        # per-device negacyclic twists: psi^(a + D*c-index)
        tw_f.append(np.array([[(_pow(psi, a, p) * _pow(psi, d * cc, p)) % p * r % p
                               for cc in range(c)] for a in range(d)],
                             dtype=np.uint64))
        tw_i.append(np.array([[(_pow(psi_i, a + d * cc, p)) % p * r % p
                               for cc in range(c)] for a in range(d)],
                             dtype=np.uint64))
        vc_f.append(np.array([[_pow(omd, cc * k2, p) * r % p
                               for k2 in range(c)] for cc in range(c)],
                             dtype=np.uint64))
        vc_i.append(np.array([[_pow(omdi, k2 * cc, p) * cinv % p * r % p
                               for cc in range(c)] for k2 in range(c)],
                             dtype=np.uint64))
        vd_f.append(np.array([[_pow(omc, a * k1, p) * r % p
                               for k1 in range(d)] for a in range(d)],
                             dtype=np.uint64))
        vd_i.append(np.array([[_pow(omci, k1 * a, p) * dinv % p * r % p
                               for a in range(d)] for k1 in range(d)],
                             dtype=np.uint64))
        twd_f.append(np.array([[_pow(om, a * k2, p) * r % p
                                for k2 in range(c)] for a in range(d)],
                              dtype=np.uint64))
        twd_i.append(np.array([[_pow(om_i, a * k2, p) * r % p
                                for k2 in range(c)] for a in range(d)],
                              dtype=np.uint64))
    out["tw_f"] = np.stack(tw_f, axis=1)      # (D, P, C)
    out["tw_i"] = np.stack(tw_i, axis=1)
    out["vc_f"] = np.stack(vc_f)              # (P, C, C)
    out["vc_i"] = np.stack(vc_i)
    out["vd_f"] = np.stack(vd_f)              # (P, D, D)
    out["vd_i"] = np.stack(vd_i)
    out["twd_f"] = np.stack(twd_f, axis=1)    # (D, P, C)
    out["twd_i"] = np.stack(twd_i, axis=1)
    return out


def _mat_mod(x, v_mont, p, pinv):
    """(..., K) x (K, M) mod-p matmul via Montgomery muls + lazy u64 sums
    (K * p^2 / 2^32 < 2^62 for K <= 2^16 at 30-bit primes)."""
    prods = ntt.mont_mul(x[..., :, None], v_mont[None, :, :], p, pinv, jnp)
    acc = prods.sum(axis=-2)          # lazy, < K * p < 2^47
    r2 = (int(1 << 32) ** 2) % int(p)
    y = ntt.mont_mul(acc, U64(1), p, pinv, jnp)       # REDC
    return ntt.mont_mul(y, U64(r2), p, pinv, jnp)     # re-enter normal


def _fwd_local(res, t, pi, axis_name):
    """Device-local slice (..., C) residues -> distributed eval slice
    (..., C) laid out (k2loc-major, k1-minor) for our k2 block."""
    p = t["plan"].plans[pi].p
    pinv = t["plan"].plans[pi].p_inv_neg32
    z = ntt.mont_mul(res, t["tw_f_s"][0, pi], p, pinv, jnp)
    y = _mat_mod(z, t["vc_f_r"][pi], p, pinv)          # cyclic-C over c
    y = ntt.mont_mul(y, t["twd_f_s"][0, pi], p, pinv, jnp)
    d = t["vd_f_r"].shape[-1]
    c = y.shape[-1]
    # transpose step: split k2 into D blocks (block-major), exchange so
    # device b ends up with ALL source devices' values for block b
    yb = jnp.moveaxis(y.reshape(y.shape[:-1] + (d, c // d)), -2, 0)
    ya = jax.lax.all_to_all(yb, axis_name, split_axis=0, concat_axis=0)
    # ya: (D source-a, ..., C/D k2loc)
    x2 = _mat_mod(jnp.moveaxis(ya, 0, -1), t["vd_f_r"][pi], p, pinv)
    return x2.reshape(y.shape[:-1] + (c // d * d,))    # (..., k2loc*k1)


def _inv_local(ev, t, pi, axis_name):
    p = t["plan"].plans[pi].p
    pinv = t["plan"].plans[pi].p_inv_neg32
    d = t["vd_f_r"].shape[-1]
    c = t["vc_f_r"].shape[-1]
    x2 = ev.reshape(ev.shape[:-1] + (c // d, d))       # (..., k2loc, k1)
    ya = _mat_mod(x2, t["vd_i_r"][pi], p, pinv)        # (..., k2loc, a)
    ya = jnp.moveaxis(ya, -1, 0)                       # (a, ..., k2loc)
    yb = jax.lax.all_to_all(ya, axis_name, split_axis=0, concat_axis=0)
    # yb: (D k2-block, ..., C/D k2loc) back on device a
    y = jnp.moveaxis(yb, 0, -2).reshape(ev.shape[:-1] + (c,))
    y = ntt.mont_mul(y, t["twd_i_s"][0, pi], p, pinv, jnp)
    z = _mat_mod(y, t["vc_i_r"][pi], p, pinv)
    return ntt.mont_mul(z, t["tw_i_s"][0, pi], p, pinv, jnp)


def sharded_negacyclic_polymul(mesh: Mesh, a, b, n_primes: int = 4,
                               axis_name: str = "poly"):
    """Exact negacyclic u64 polynomial product with the POLY axis sharded
    across the mesh (strided: device a holds coefficients a::D).

    a, b: (..., N) uint64 (host/replicated); returns (..., N) uint64 ==
    ntt.negacyclic_polymul_u64.  The forward/inverse transforms are the
    four-step split above; XLA lowers the transpose to one ICI all_to_all
    per direction per prime.
    """
    n = a.shape[-1]
    n_dev = mesh.devices.size
    t = make_poly_shard_tables(n, n_dev, n_primes)
    plan = t["plan"]

    # strided reshard: (..., N) -> (..., D, C) with D the sharded axis
    def to_strided(x):
        xs = x.reshape(x.shape[:-1] + (n // n_dev, n_dev))
        return jnp.moveaxis(xs, -1, -2)   # (..., D, C)

    def from_strided(xs):
        return jnp.moveaxis(xs, -2, -1).reshape(xs.shape[:-2] + (n,))

    spec_x = P(*([None] * (a.ndim - 1) + [axis_name, None]))
    dev_tables = {}
    for key in ("tw_f", "tw_i", "twd_f", "twd_i"):
        dev_tables[key + "_s"] = jax.device_put(
            t[key], NamedSharding(mesh, P(axis_name, None, None)))
    for key in ("vc_f", "vc_i", "vd_f", "vd_i"):
        dev_tables[key + "_r"] = jax.device_put(
            t[key], NamedSharding(mesh, P()))
    dev_tables["plan"] = plan

    from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map
    # alias drops check_rep, which the pallas-bearing bodies need disabled

    a_s = jax.device_put(to_strided(a), NamedSharding(mesh, spec_x))
    b_s = jax.device_put(to_strided(b), NamedSharding(mesh, spec_x))

    in_specs = ((spec_x, spec_x)
                + (P(axis_name, None, None),) * 4
                + (P(None, None, None),) * 4)
    table_args = [dev_tables[k + "_s"] for k in ("tw_f", "tw_i", "twd_f",
                                                 "twd_i")] + \
                 [dev_tables[k + "_r"] for k in ("vc_f", "vc_i", "vd_f",
                                                 "vd_i")]

    def per_device(av, bv, tw_f, tw_i, twd_f, twd_i, vc_f, vc_i, vd_f, vd_i):
        tt = {"tw_f_s": tw_f, "tw_i_s": tw_i, "twd_f_s": twd_f,
              "twd_i_s": twd_i, "vc_f_r": vc_f, "vc_i_r": vc_i,
              "vd_f_r": vd_f, "vd_i_r": vd_i, "plan": plan}
        av = av[..., 0, :]   # our device's (..., C) slice
        bv = bv[..., 0, :]
        outs = []
        for pi, p in enumerate(plan.primes):
            pp = plan.plans[pi]
            ra = jnp.mod(av, pp.p)
            rb = jnp.mod(bv, pp.p)
            ea = _fwd_local(ra, tt, pi, axis_name)
            eb = _fwd_local(rb, tt, pi, axis_name)
            ebm = ntt.mont_mul(eb, U64(int(pp.r2)), pp.p, pp.p_inv_neg32,
                               jnp)   # to Montgomery
            prod = ntt.mont_mul(ea, ebm, pp.p, pp.p_inv_neg32, jnp)
            outs.append(_inv_local(prod, tt, pi, axis_name))
        res = jnp.stack(outs, axis=-2)        # (..., P, C)
        out = ntt.garner_to_u64(res, plan, jnp)
        return out[..., None, :]              # (..., 1, C)

    f = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=in_specs, out_specs=spec_x, check_rep=False))
    out = f(a_s, b_s, *table_args)
    return from_strided(out)


# ---------------------------------------------------------------------------
# P5 blind rotate: replicated accumulator, poly-sharded bootstrap key
# ---------------------------------------------------------------------------
# At the huge-N parameter families (3_3/4_4, noise squashing: N = 2^13..16)
# the bootstrap key's NTT representation is what outgrows one chip's HBM.
# The tensor-parallel pattern: GGSW eval tensors shard over the poly axis
# (1/D per chip), the small (B, k+1, N) accumulator replicates, and each
# CMux step runs decompose (local) -> distributed forward (all_to_all) ->
# sharded pointwise -> distributed inverse -> all_gather (+add).


def prepare_bsk_poly_sharded(mesh: Mesh, bsk_u64, n_primes: int = 4,
                             axis_name: str = "poly"):
    """(n, l, k+1, k+1, N) u64 coefficient GGSW rows -> eval-domain
    Montgomery slices (n, l, k+1, k+1, P, D, C), poly-sharded on axis -2.
    Layout is produced by the SAME distributed forward the rotation uses,
    so no permutation bookkeeping can drift."""
    from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map
    # alias drops check_rep, which the pallas-bearing bodies need disabled

    n = bsk_u64.shape[-1]
    n_dev = mesh.devices.size
    t = make_poly_shard_tables(n, n_dev, n_primes)
    plan = t["plan"]

    xs = bsk_u64.reshape(bsk_u64.shape[:-1] + (n // n_dev, n_dev))
    xs = jnp.moveaxis(xs, -1, -2)     # (..., D, C) strided
    nd = xs.ndim
    spec_x = P(*([None] * (nd - 2) + [axis_name, None]))
    tab_specs = ((P(axis_name, None, None),) * 2
                 + (P(None, None, None),) * 2)
    tabs = [jax.device_put(t["tw_f"], NamedSharding(mesh, P(axis_name, None, None))),
            jax.device_put(t["twd_f"], NamedSharding(mesh, P(axis_name, None, None))),
            jax.device_put(t["vc_f"], NamedSharding(mesh, P())),
            jax.device_put(t["vd_f"], NamedSharding(mesh, P()))]
    xs = jax.device_put(xs, NamedSharding(mesh, spec_x))

    def per_device(xv, tw_f, twd_f, vc_f, vd_f):
        tt = {"tw_f_s": tw_f, "twd_f_s": twd_f, "vc_f_r": vc_f,
              "vd_f_r": vd_f, "plan": plan}
        x = xv[..., 0, :]
        outs = []
        for pi, p in enumerate(plan.primes):
            pp = plan.plans[pi]
            r = jnp.mod(x, pp.p)
            e = _fwd_local(r, tt, pi, axis_name)
            outs.append(ntt.mont_mul(e, U64(int(pp.r2)), pp.p,
                                     pp.p_inv_neg32, jnp))
        return jnp.stack(outs, axis=-2)[..., None, :]   # (..., P, 1, C)

    out_spec = P(*([None] * (nd - 2) + [None, axis_name, None]))
    f = jax.jit(shard_map(per_device, mesh=mesh,
                          in_specs=(spec_x,) + tab_specs,
                          out_specs=out_spec, check_rep=False))
    return f(xs, *tabs)


def sharded_blind_rotate_poly(mesh: Mesh, msed_mask, msed_body, lut,
                              bsk_evals, base_log: int, levels: int,
                              n_primes: int = 4, bits: int = 64,
                              axis_name: str = "poly"):
    """Batched blind rotation with the POLY axis of the bootstrap key
    sharded across the mesh; bit-identical to ops.server.blind_rotate.

    msed_mask (B, n) u64 in [0, 2N); msed_body (B,); lut (B, k+1, N) u64;
    bsk_evals from prepare_bsk_poly_sharded."""
    from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map
    # alias drops check_rep, which the pallas-bearing bodies need disabled

    from ..ops import server as srv

    b, k1, n_poly = lut.shape
    n_dev = mesh.devices.size
    c_loc = n_poly // n_dev
    t = make_poly_shard_tables(n_poly, n_dev, n_primes)
    plan = t["plan"]

    acc0 = srv.monomial_div(lut, msed_body[:, None, None])
    acc0 = jax.device_put(acc0, NamedSharding(mesh, P()))
    mask = jax.device_put(msed_mask, NamedSharding(mesh, P()))

    tab_keys_s = ("tw_f", "tw_i", "twd_f", "twd_i")
    tab_keys_r = ("vc_f", "vc_i", "vd_f", "vd_i")
    tabs = [jax.device_put(t[k], NamedSharding(mesh, P(axis_name, None, None)))
            for k in tab_keys_s] + \
           [jax.device_put(t[k], NamedSharding(mesh, P())) for k in tab_keys_r]
    bsk_spec = P(None, None, None, None, None, axis_name, None)

    def per_device(acc, mask_r, bsk, tw_f, tw_i, twd_f, twd_i,
                   vc_f, vc_i, vd_f, vd_i):
        tt = {"tw_f_s": tw_f, "tw_i_s": tw_i, "twd_f_s": twd_f,
              "twd_i_s": twd_i, "vc_f_r": vc_f, "vc_i_r": vc_i,
              "vd_f_r": vd_f, "vd_i_r": vd_i, "plan": plan}
        my_a = jax.lax.axis_index(axis_name)

        def step(acc, xs):
            a_i, ggsw = xs       # (B,), (l, r, c, P, 1, C)
            rot = srv.monomial_mul(acc, a_i[:, None, None])
            ct1 = rot - acc
            ct1s = jnp.take(ct1.reshape(b, k1, c_loc, n_dev), my_a, axis=-1)
            digits = srv.signed_decompose(ct1s, base_log, levels, bits)
            res = srv._digits_to_residues(digits, plan)  # (l,B,k+1,P,C)
            outs = []
            for pi in range(plan.num_primes):
                pp = plan.plans[pi]
                fwd = _fwd_local(res[..., pi, :], tt, pi, axis_name)
                key = ggsw[..., pi, 0, :].astype(U64)    # (l, r, c, C)
                pa = None
                for lev in range(levels):
                    for rr in range(k1):
                        pr = ntt.mont_mul(fwd[lev][:, rr, None, :],
                                          key[lev, rr][None], pp.p,
                                          pp.p_inv_neg32, jnp)  # (B,c,C)
                        pa = pr if pa is None else \
                            ntt._add_mod(pa, pr, pp.p, jnp)
                outs.append(_inv_local(pa, tt, pi, axis_name))
            coeffs = jnp.stack(outs, axis=-2)            # (B, c, P, C)
            slice_u64 = ntt.garner_to_u64(coeffs, plan, jnp)
            full = jax.lax.all_gather(slice_u64, axis_name)  # (D,B,c,C)
            prod = jnp.moveaxis(full, 0, -1).reshape(b, k1, n_poly)
            return acc + prod, None

        acc, _ = jax.lax.scan(step, acc, (mask_r.T, bsk))
        return acc

    f = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), bsk_spec) + (P(axis_name, None, None),) * 4
                 + (P(None, None, None),) * 4,
        out_specs=P(), check_rep=False))
    return f(acc0, mask, bsk_evals, *tabs)


def sharded_ks_pbs_poly(mesh: Mesh, ct, lut, ksk, bsk_evals,
                        ks_base_log: int, ks_levels: int,
                        pbs_base_log: int, pbs_levels: int,
                        bits: int = 64, centered_ms: bool = False,
                        n_primes: int = 4, axis_name: str = "poly"):
    """Full atomic pattern with INTRA-PBS poly-axis parallelism: KS + MS run
    replicated (cheap), the blind rotation splits each CMux step's
    polynomial work across the mesh (sharded_blind_rotate_poly) — the
    LATENCY lever for small batches, the TP analog of the CUDA cg/tbc
    grid-wide kernels (programmable_bootstrap_cg_classic.cuh:40).  With a
    full batch, prefer mesh.sharded_ks_pbs_* (pure data parallelism)."""
    from ..ops import server as srv

    n_poly = lut.shape[-1]
    log_mod = n_poly.bit_length()
    ks = srv.keyswitch(ct, ksk, ks_base_log, ks_levels, bits)
    if centered_ms:
        corr = srv.centered_binary_ms_correction(ks, log_mod, bits)
        body = srv.modulus_switch(ks[:, -1] + corr, log_mod, bits)
    else:
        body = srv.modulus_switch(ks[:, -1], log_mod, bits)
    msed = srv.modulus_switch(ks[:, :-1], log_mod, bits)
    acc = sharded_blind_rotate_poly(mesh, msed, body, lut, bsk_evals,
                                    pbs_base_log, pbs_levels, n_primes,
                                    bits, axis_name)
    return srv.sample_extract(acc)


# ---------------------------------------------------------------------------
# latency-mesh routing: opt-in global mesh consulted by the shortint
# ServerKey for SMALL batches (VERDICT r2 task 4)
# ---------------------------------------------------------------------------

_LATENCY_MESH = None
_LATENCY_THRESHOLD = 16


def set_latency_mesh(mesh: Mesh | None, threshold: int = 16,
                     axis_name: str = "poly"):
    """Route small LUT batches (< threshold) through the poly-sharded
    atomic pattern on `mesh` — ONE PBS then uses the whole mesh instead of
    one chip.  Pass None to disable.  Large batches keep the data-parallel
    path (mesh.sharded_ks_pbs_*), which scales throughput instead."""
    global _LATENCY_MESH, _LATENCY_THRESHOLD
    _LATENCY_MESH = (mesh, axis_name) if mesh is not None else None
    _LATENCY_THRESHOLD = threshold


def latency_mesh():
    return _LATENCY_MESH


def latency_threshold() -> int:
    return _LATENCY_THRESHOLD
