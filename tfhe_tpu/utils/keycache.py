"""On-disk key cache so tests/benches don't pay keygen repeatedly.

Analog of tfhe/src/keycache/mod.rs (FileStorage/KeyCache with file locks):
keys per parameter set are generated once and persisted (npz).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

CACHE_DIR = Path(os.environ.get("TFHE_TPU_KEY_CACHE",
                                Path(__file__).resolve().parents[2] / ".keys"))


def _params_tag(params, seed) -> str:
    raw = repr(params) + f"/seed={seed}"
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def get_shortint_keys(params, seed: int = 0x7FEE):
    """Returns (ClientKey, ServerKey) for the parameter set, cached on disk."""
    from ..shortint.client_key import ClientKey
    from ..shortint.server_key import ServerKey

    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tag = _params_tag(params, seed)
    path = CACHE_DIR / f"shortint_{tag}.npz"
    ck = ClientKey(params, seed)  # secret keygen is cheap & seed-deterministic
    from ..ops import ntt as _ntt

    if path.exists():
        try:
            data = np.load(path)
            if "primes" in data:
                cached_primes = tuple(int(x) for x in data["primes"])
            else:
                cached_primes = None
            np_ = int(data["num_primes"])
            if cached_primes != _ntt.PRIMES[:np_]:
                raise ValueError("key cache built with a different prime pool")
            if "bsk_coeff" not in data:
                raise ValueError("stale key cache (no coefficient BSK)")
            sk = ServerKey.__new__(ServerKey)
            sk.params = params
            import jax.numpy as jnp

            from ..core.entities import LweBootstrapKey
            from ..ops import ntt

            sk.ksk = jnp.asarray(data["ksk"])
            sk.bsk_mont = jnp.asarray(data["bsk_mont"])
            sk.plan = ntt.make_plan(params.polynomial_size, int(data["num_primes"]))
            sk.max_degree = params.total_modulus - 1
            sk.max_noise_level = params.max_noise_level
            sk.pbs_count = 0
            sk._bsk_coeff = LweBootstrapKey(
                data["bsk_coeff"], params.core.pbs_decomp, params.bits)
            return ck, sk
        except Exception:
            path.unlink(missing_ok=True)
    sk = ServerKey(ck, seed)
    if getattr(sk, "mb_bsk_mont", None) is not None:
        return ck, sk   # multi-bit keys are not npz-cached yet (fast enough)
    np.savez(path, ksk=np.asarray(sk.ksk), bsk_mont=np.asarray(sk.bsk_mont),
             num_primes=sk.plan.num_primes,
             primes=np.asarray(sk.plan.primes, dtype=np.int64),
             bsk_coeff=np.asarray(sk._bsk_coeff.data))
    return ck, sk
