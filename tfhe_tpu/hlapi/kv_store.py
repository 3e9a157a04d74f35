"""KVStore: encrypted-key lookup/update over a clear-keyed map
(high_level_api/kv_store.rs:67, integer kv_store primitives).

get(enc_key):   sum_k [enc_key == k] * value_k      (one masked-select round
                per entry, batched; zero if absent)
update(enc_key, new_value): value_k' = select([enc_key == k], new_value,
                value_k) for every entry.
map_values(f):  apply a clear function to every stored value.
"""

from __future__ import annotations

from ..integer.ciphertext import RadixCiphertext
from ..integer.server_key import ServerKey


class KVStore:
    def __init__(self, server_key: ServerKey, num_blocks: int):
        self.sk = server_key
        self.num_blocks = num_blocks
        self._entries: dict[int, RadixCiphertext] = {}

    def insert_clear_key(self, key: int, value: RadixCiphertext) -> None:
        self._entries[int(key)] = value

    def __len__(self) -> int:
        return len(self._entries)

    def get(self, enc_key: RadixCiphertext) -> RadixCiphertext:
        """Encrypted lookup; encrypts 0 when the key is absent."""
        sk = self.sk
        acc = sk.create_trivial_radix(0, self.num_blocks)
        zero = sk.create_trivial_radix(0, self.num_blocks)
        for k, v in self._entries.items():
            hit = sk.scalar_eq_parallelized(enc_key, k)
            masked = sk.if_then_else_parallelized(hit, v, zero)
            acc = sk.add_parallelized(acc, masked)
        return acc

    def update(self, enc_key: RadixCiphertext, new_value: RadixCiphertext) -> None:
        sk = self.sk
        for k, v in list(self._entries.items()):
            hit = sk.scalar_eq_parallelized(enc_key, k)
            self._entries[k] = sk.if_then_else_parallelized(hit, new_value, v)

    def map_values(self, f) -> None:
        """Apply an encrypted-domain function v -> f(v) to every value."""
        for k, v in list(self._entries.items()):
            self._entries[k] = f(v)

    def decrypt_all(self, client_key) -> dict:
        return {k: client_key.decrypt_radix(v) for k, v in self._entries.items()}
