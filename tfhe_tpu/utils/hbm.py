"""Device-memory admission control (analog of the reference's
check_valid_cuda_malloc, core_crypto/gpu/mod.rs:234): size batched work to
the accelerator's free HBM instead of discovering OOM at compile time.

The round-3 decompression bench died exactly this way (16.25 GB requested
of 15.75 GB); the batch should have been chunked.
"""

from __future__ import annotations

import os


def device_free_bytes(default: int = 12 << 30) -> int:
    """Free HBM on the default accelerator (bytes).  Falls back to
    `default` when the backend exposes no memory stats (CPU, interpret,
    some plugins); override with TFHE_TPU_HBM_BYTES."""
    env = os.environ.get("TFHE_TPU_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit")
            used = stats.get("bytes_in_use", 0)
            if limit:
                return max(0, int(limit) - int(used))
    except Exception:
        pass
    return default


def admit_chunk(n_items: int, bytes_per_item: int, fixed_bytes: int = 0,
                headroom: float = 0.85, min_items: int = 8) -> int:
    """Largest chunk of a batched device op that fits the free HBM.

    bytes_per_item: peak per-element working set of the op;
    fixed_bytes: batch-independent residents the op needs (keys already on
    device do NOT count — they are in bytes_in_use).  Returns a chunk size
    in [min_items, n_items]."""
    free = device_free_bytes()
    budget = max(0, int(free * headroom) - fixed_bytes)
    if bytes_per_item <= 0:
        return n_items
    c = budget // bytes_per_item
    return int(max(min_items, min(n_items, c)))
