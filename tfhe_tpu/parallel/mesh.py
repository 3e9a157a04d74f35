"""Mesh sharding of the PBS batch axis.

The reference's multi-GPU layer scatters LWE arrays round-robin across GPUs
and gathers results (backends/tfhe-cuda-backend/cuda/include/
helper_multi_gpu.h:1-80, integer.cuh:945-988).  The TPU-native equivalent is
GSPMD: a 1-D device mesh with a "batch" axis, ciphertext batches sharded over
it, keys replicated, and XLA inserting any needed collectives.  Scale-out to
a multi-host pod slice is the same program over a bigger mesh.

Axes (SURVEY.md §2.13): "batch" (data-parallel over ciphertexts) is the
primary axis; the "poly" axis for sharding single huge-N polynomial
transforms (the large-parameter N >= 2^14 configurations, P5) lives in
parallel/poly_shard.py — distributed four-step NTT with all_to_all
transposes and a poly-sharded-BSK blind rotate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import server as srv


def make_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, x, axis_name: str = "batch"):
    """Place an array with leading batch dim sharded across the mesh."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_ks_pbs(mesh: Mesh, ct, lut, ksk, bsk_mont, plan,
                   ks_base_log: int, ks_levels: int,
                   pbs_base_log: int, pbs_levels: int,
                   bits: int = 64, centered_ms: bool = False,
                   axis_name: str = "batch"):
    """Batched KS->PBS with the batch axis sharded over the mesh.

    Keys are replicated (59 MB Fourier-BSK analog fits every chip's HBM);
    each device bootstraps its shard; no cross-device communication is needed
    in the steady state — the pure data-parallel regime that gives linear
    PBS/s scaling.
    """
    ct = shard_batch(mesh, ct, axis_name)
    lut = shard_batch(mesh, lut, axis_name)
    ksk = replicate(mesh, ksk)
    bsk_mont = replicate(mesh, bsk_mont)
    out_spec = NamedSharding(mesh, P(axis_name, None))
    f = jax.jit(
        partial(srv.ks_pbs_batch, plan=plan,
                ks_base_log=ks_base_log, ks_levels=ks_levels,
                pbs_base_log=pbs_base_log, pbs_levels=pbs_levels,
                bits=bits, centered_ms=centered_ms),
        out_shardings=out_spec,
    )
    return f(ct, lut, ksk, bsk_mont)


def sharded_ks_pbs_shard_map(mesh: Mesh, ct, lut, ksk, bsk_mont, plan,
                             ks_base_log: int, ks_levels: int,
                             pbs_base_log: int, pbs_levels: int,
                             bits: int = 64, centered_ms: bool = False,
                             use_pallas: bool = False,
                             pallas_interpret: bool = False,
                             axis_name: str = "batch"):
    """Explicit shard_map variant: each device runs the full fused pipeline
    (optionally the Pallas kernel) on its batch shard — the production
    multi-chip path.  pallas_call does not partition under GSPMD, so
    shard_map is what lets the hand-written kernel scale across the mesh.
    """
    from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map
    # alias drops check_rep, which the pallas-bearing bodies need disabled

    ct = shard_batch(mesh, ct, axis_name)
    lut = shard_batch(mesh, lut, axis_name)
    ksk = replicate(mesh, ksk)
    bsk_mont = replicate(mesh, bsk_mont)

    def per_device(ct_s, lut_s, ksk_r, bsk_r):
        return srv.ks_pbs_batch(ct_s, lut_s, ksk_r, bsk_r, plan,
                                ks_base_log, ks_levels, pbs_base_log,
                                pbs_levels, bits, centered_ms, use_pallas,
                                pallas_interpret=pallas_interpret)

    f = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None, None), P(), P()),
        out_specs=P(axis_name, None),
        # pallas_call outputs carry no vma metadata; the pipeline is purely
        # data-parallel so the varying-mesh-axes check adds nothing
        check_rep=False,
    ))
    return f(ct, lut, ksk, bsk_mont)


def sharded_ks_pbs_mxu(mesh: Mesh, ct, lut, ksk, m_limbs, mplan,
                       ks_base_log: int, ks_levels: int,
                       pbs_base_log: int, pbs_levels: int,
                       bits: int = 64, centered_ms: bool = False,
                       tb: int = 64, fold_mode: str = "solinas",
                       kernel: str = "v3", interpret: bool = False,
                       axis_name: str = "batch", corr_mid=None):
    """Multi-chip variant of the production MXU stack (ks_pbs_batch_mxu):
    batch sharded, the compact middle tensors (~1.4 GB at 3-prime 2_2)
    replicated per chip, each device running the fused v3/v4/v5 kernel on
    its shard via shard_map — pure data parallelism, no steady-state
    collectives, linear PBS/s scaling over ICI.  kernel="v5" takes the
    packed-u32 middle words as m_limbs plus corr_mid (mxu.bsk_to_mxu_v5)."""
    from jax.experimental.shard_map import shard_map  # noqa: the jax.shard_map
    # alias drops check_rep, which the pallas-bearing bodies need disabled

    ct = shard_batch(mesh, ct, axis_name)
    lut = shard_batch(mesh, lut, axis_name)
    ksk = replicate(mesh, ksk)
    m_limbs = replicate(mesh, m_limbs)
    extra_specs = ()
    extra_args = ()
    if corr_mid is not None:
        extra_specs = (P(),)
        extra_args = (replicate(mesh, corr_mid),)

    def per_device(ct_s, lut_s, ksk_r, m_r, *corr_r):
        return srv.ks_pbs_batch_mxu(
            ct_s, lut_s, ksk_r, m_r, mplan, ks_base_log, ks_levels,
            pbs_base_log, pbs_levels, bits, centered_ms, tb,
            fold_mode=fold_mode, kernel=kernel, interpret=interpret,
            corr_mid=corr_r[0] if corr_r else None)

    f = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None, None), P(), P())
                 + extra_specs,
        out_specs=P(axis_name, None),
        check_rep=False,
    ))
    return f(ct, lut, ksk, m_limbs, *extra_args)
