"""High-level API: FheUint/FheInt/FheBool with operator overloads.

Analog of tfhe::high_level_api (SURVEY.md §2.7): `generate_keys(config)`,
`set_server_key` thread-global state (global_state.rs:66), typed integers
with Python operator overloads dispatching to the batched integer backend.
"""

from .config import Config, ConfigBuilder
from .array import FheUintArray
from .strings import FheAsciiString
from .tag import Tag
from .xof_key_set import CompressedXofKeySet, XofKeySet
from .keys import ClientKey, CompressedServerKey, PublicKey, ServerKey, generate_keys
from .global_state import set_server_key, unset_server_key
from .types import (
    FheBool,
    FheInt2,
    FheInt4,
    FheInt8,
    FheInt16,
    FheInt32,
    FheInt64,
    FheInt128,
    FheInt160,
    FheInt256,
    FheUint2,
    FheUint4,
    FheUint8,
    FheUint16,
    FheUint32,
    FheUint64,
    FheUint6,
    FheUint10,
    FheUint12,
    FheUint14,
    FheUint128,
    FheUint160,
    FheUint256,
    FheUint512,
    FheUint1024,
    FheUint2048,
)

__all__ = [
    "Config", "ConfigBuilder", "ClientKey", "ServerKey", "CompressedServerKey",
    "PublicKey", "generate_keys", "set_server_key", "unset_server_key",
    "FheUintArray", "FheAsciiString", "Tag", "CompressedXofKeySet", "XofKeySet",
    "FheBool", "FheUint2", "FheUint4", "FheUint6", "FheUint8", "FheUint10",
    "FheUint12", "FheUint14", "FheUint16", "FheUint32",
    "FheUint64", "FheUint128", "FheUint160", "FheUint256", "FheUint512",
    "FheUint1024", "FheUint2048",
    "FheInt2", "FheInt4", "FheInt8", "FheInt16", "FheInt32", "FheInt64",
    "FheInt128", "FheInt160", "FheInt256",
]
