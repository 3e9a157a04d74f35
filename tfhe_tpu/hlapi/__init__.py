"""High-level API: FheUint/FheInt/FheBool with operator overloads.

Analog of tfhe::high_level_api (SURVEY.md §2.7): `generate_keys(config)`,
`set_server_key` thread-global state (global_state.rs:66), typed integers
with Python operator overloads dispatching to the batched integer backend.
"""

from .config import Config, ConfigBuilder
from .keys import ClientKey, CompressedServerKey, PublicKey, ServerKey, generate_keys
from .global_state import set_server_key, unset_server_key
from .types import (
    FheBool,
    FheInt8,
    FheInt16,
    FheInt32,
    FheInt64,
    FheUint2,
    FheUint4,
    FheUint8,
    FheUint16,
    FheUint32,
    FheUint64,
    FheUint128,
)

__all__ = [
    "Config", "ConfigBuilder", "ClientKey", "ServerKey", "CompressedServerKey",
    "PublicKey", "generate_keys", "set_server_key", "unset_server_key",
    "FheBool", "FheUint2", "FheUint4", "FheUint8", "FheUint16", "FheUint32",
    "FheUint64", "FheUint128", "FheInt8", "FheInt16", "FheInt32", "FheInt64",
]
