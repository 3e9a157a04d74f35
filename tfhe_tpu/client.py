"""Client-role surface: everything a key-holding client needs, NO JAX.

The reference ships this role as js_on_wasm_api/ (wasm-bindgen over the
client primitives).  Here the client role is pure Python/NumPy by
construction — this module is the explicit facade proving it: it imports
keygen, encryption/decryption, compact lists, ZK proofs, and serialization
WITHOUT touching jax, so any host (including a browser via Pyodide) can run
the client side.  tests/test_client_only.py imports the package with jax
blocked to keep this true.
"""

from __future__ import annotations

# shortint client role
from .shortint.ciphertext import Ciphertext  # noqa: F401
from .shortint.client_key import ClientKey as ShortintClientKey  # noqa: F401
from .shortint.params import (  # noqa: F401
    DEFAULT_PARAMS,
    TEST_PARAM_MESSAGE_2_CARRY_2,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    MultiBitPBSParameters,
    ShortintParams,
)

# integer client role
from .integer.ciphertext import (  # noqa: F401
    BooleanBlock,
    RadixCiphertext,
    SignedRadixCiphertext,
)
from .integer.client_key import ClientKey as IntegerClientKey  # noqa: F401

# serialization (versioned CBOR, safe limits)
from .utils.serialization import (  # noqa: F401
    deserialize,
    safe_deserialize,
    safe_serialize,
    serialize,
)

# ZK proofs of encryption (prove on the client, pure Python)
from .zk import pke, pke_v2  # noqa: F401

__all__ = [
    "Ciphertext",
    "ShortintClientKey",
    "IntegerClientKey",
    "RadixCiphertext",
    "SignedRadixCiphertext",
    "BooleanBlock",
    "ShortintParams",
    "MultiBitPBSParameters",
    "DEFAULT_PARAMS",
    "TEST_PARAM_MESSAGE_2_CARRY_2",
    "V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
    "serialize",
    "deserialize",
    "safe_serialize",
    "safe_deserialize",
    "pke",
    "pke_v2",
]
