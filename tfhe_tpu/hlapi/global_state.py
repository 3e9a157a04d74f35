"""Thread-local server-key state (high_level_api/global_state.rs:18,66)."""

from __future__ import annotations

import threading

_state = threading.local()


def set_server_key(server_key) -> None:
    _state.key = server_key


def unset_server_key() -> None:
    _state.key = None


def internal_server_key():
    key = getattr(_state, "key", None)
    if key is None:
        raise RuntimeError(
            "No server key set. Call tfhe_tpu.set_server_key(server_key) first."
        )
    return key
