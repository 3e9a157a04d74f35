"""tfhe_tpu: a TPU-native TFHE framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of zama-ai/tfhe-rs, designed
batch-first for TPU: exact CRT-NTT polynomial arithmetic instead of f64 FFT,
fused jitted KS->PBS pipelines instead of per-ciphertext rayon loops, and
mesh sharding of the PBS batch axis for scale-out.

CLIENT-ONLY MODE (the reference's js_on_wasm_api story): when JAX is not
installed, the package still imports and exposes the client role — keygen,
encrypt/decrypt, compact lists, ZK proofs, serialization — which is pure
Python/NumPy and runs anywhere (including a browser via Pyodide).  The
server-side compute surface (hlapi ops, ServerKey) needs JAX.  See
tfhe_tpu.client and tests/test_client_only.py.
"""

import os as _os

try:
    import jax as _jax
    _HAS_JAX = True
except ImportError:  # client-only environment (e.g. Pyodide)
    _HAS_JAX = False

if _HAS_JAX:
    # 64-bit integer torus arithmetic everywhere.
    _jax.config.update("jax_enable_x64", True)

    # PBS pipelines are compile-heavy (unrolled NTT stages inside lax.scan);
    # persist compiled executables across processes.
    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("TFHE_TPU_JAX_CACHE",
                            _os.path.expanduser("~/.cache/tfhe_tpu_jax")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from . import boolean, hlapi, integer, shortint  # noqa: E402,F401
    # Re-export the whole high-level API at the package root, like the
    # reference's `use tfhe::{FheUint8, FheInt8, FheAsciiString, ...}`.
    from .hlapi import *  # noqa: E402,F401,F403
else:
    from . import client  # noqa: E402,F401
    from .client import *  # noqa: E402,F401,F403

__version__ = "0.1.0"
