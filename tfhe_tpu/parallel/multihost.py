"""Multi-host (pod-slice) scaffolding: 1 chip -> 1 host -> N hosts.

The reference has no multi-node backend at all (SURVEY.md §2.13 — a "node"
is one process; multi-GPU is P2P copies inside one host).  The TPU-native
scale-out story is instead:

* **Runtime**: `jax.distributed.initialize` connects the per-host
  processes over DCN; afterwards `jax.devices()` spans the whole slice and
  one GSPMD program runs SPMD across it (`init_distributed`).
* **Mesh**: a 2-axis `(batch, poly)` mesh (`make_pod_mesh`).  "batch" is
  the throughput axis (ciphertext data-parallelism, the analog of the CUDA
  backend's multi-GPU scatter/gather, helper_multi_gpu.h:1-80); "poly" is
  the latency axis (intra-PBS polynomial sharding with all_to_all NTT
  transposes, parallel/poly_shard.py).  Shardings ride ICI within a host
  and DCN across hosts; keys are replicated so the steady state moves no
  key bytes.
* **Key "broadcast"**: a no-op by design.  Keygen is deterministic from a
  seed (fork-tree AES-CTR CSPRNG, utils/csprng.py — the same property the
  reference uses for deterministic parallel keygen), so every host derives
  bit-identical keys locally from the shared seed (`derive_pod_keys`)
  instead of shipping a multi-GB BSK over DCN.  Only the 16-byte seed is
  coordinated.

Single-host processes can exercise everything here on a virtual CPU mesh
(tests/test_multichip.py + __graft_entry__.dryrun_multichip); a real pod
slice only changes `init_distributed` arguments.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime for a multi-host slice.

    No-op (returns False) when single-process: the same code path then
    runs on one host's devices.  On a pod slice, call this once per host
    process before any other JAX API, with the coordinator's address and
    this process's index — afterwards `jax.devices()` is global and
    `jax.process_index()` identifies this host.
    """
    if num_processes in (None, 0, 1):
        return False
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def make_pod_mesh(batch: int | None = None, poly: int | None = None,
                  devices=None) -> Mesh:
    """2-axis (batch, poly) mesh over the slice's devices.

    Defaults: poly=1 (pure data parallelism — the right default for the
    production N=2048 parameters where one chip fits a whole PBS); pass
    poly>1 for the latency regime (small batches, or the N >= 2^14
    parameter families whose transforms are worth splitting).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if poly is None:
        poly = 1
    if batch is None:
        batch = n // poly
    assert batch * poly == n, (batch, poly, n)
    return Mesh(devices.reshape(batch, poly), ("batch", "poly"))


def derive_pod_keys(params, seed: int):
    """Derive the (client, server) keypair deterministically from `seed`.

    Every host of a pod calls this with the same seed and obtains
    bit-identical keys (deterministic fork-tree CSPRNG) — the multi-host
    "key broadcast" is therefore the coordination of one 128-bit seed, not
    a DCN transfer of the multi-GB key material.  Uses the keycache when
    available so repeated runs on one host pay keygen once.
    """
    from ..shortint import ClientKey, ServerKey

    ck = ClientKey(params, seed=seed)
    sk = ServerKey(ck)
    return ck, sk


def shard_batch_pod(mesh: Mesh, x):
    """Shard a leading batch dim over the pod's batch axis (poly axis
    replicated) — ciphertext batches in the 2-axis regime."""
    spec = P("batch", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate_pod(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
