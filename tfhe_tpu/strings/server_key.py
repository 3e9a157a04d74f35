"""Encrypted string operations.

Mirrors strings/server_key/ (comp.rs comparisons, no_patterns.rs len/case,
pattern/ contains/starts/ends/find), re-expressed over the batched integer
backend: every per-char round (eq grids, case LUTs) is one fused PBS batch.
"""

from __future__ import annotations

from ..integer.ciphertext import BooleanBlock, RadixCiphertext
from ..integer.server_key import ServerKey as IntegerServerKey
from .ciphertext import FheString


class StringServerKey:
    def __init__(self, integer_key: IntegerServerKey):
        self.sk = integer_key

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _char_eq(self, a: RadixCiphertext, b: RadixCiphertext) -> BooleanBlock:
        return self.sk.eq_parallelized(a, b)

    def _char_eq_clear(self, a: RadixCiphertext, c: int) -> BooleanBlock:
        return self.sk.scalar_eq_parallelized(a, c)

    def _false(self) -> BooleanBlock:
        return BooleanBlock(self.sk.key.create_trivial(0))

    def _true(self) -> BooleanBlock:
        return BooleanBlock(self.sk.key.create_trivial(1))

    # ------------------------------------------------------------------
    # comparisons (server_key/comp.rs)
    # ------------------------------------------------------------------

    def eq(self, a: FheString, b: FheString) -> BooleanBlock:
        """Content equality, honoring nul-padding semantics."""
        n = max(a.max_len, b.max_len)
        bools = []
        for i in range(n):
            if i < a.max_len and i < b.max_len:
                bools.append(self._char_eq(a.chars[i], b.chars[i]))
            elif i < a.max_len:
                bools.append(self._char_eq_clear(a.chars[i], 0))
            else:
                bools.append(self._char_eq_clear(b.chars[i], 0))
        if not bools:
            return self._true()
        return self.sk.boolean_and_many(bools)

    def ne(self, a: FheString, b: FheString) -> BooleanBlock:
        return self.sk.boolean_not(self.eq(a, b))

    def eq_clear(self, a: FheString, s: str) -> BooleanBlock:
        if len(s) > a.max_len:
            return self._false()
        bools = []
        for i in range(a.max_len):
            c = ord(s[i]) if i < len(s) else 0
            bools.append(self._char_eq_clear(a.chars[i], c))
        if not bools:
            return self._true()
        return self.sk.boolean_and_many(bools)

    # ------------------------------------------------------------------
    # no-pattern ops (no_patterns.rs)
    # ------------------------------------------------------------------

    def len_(self, a: FheString) -> RadixCiphertext:
        """Encrypted length: count of non-nul chars (nul-padded strings)."""
        nb = max(2, (max(a.max_len, 1).bit_length() + 1) // 2 + 1)
        if not a.chars:
            return self.sk.create_trivial_radix(0, nb)
        nonzero = [self.sk.scalar_ne_parallelized(c, 0) for c in a.chars]
        rows = [
            RadixCiphertext([b.block] + [self.sk.key.create_trivial(0)] * (nb - 1))
            for b in nonzero
        ]
        return self.sk.sum_ciphertexts(rows, nb)

    def is_empty(self, a: FheString) -> BooleanBlock:
        if not a.chars:
            return self._true()
        if not a.padded:
            return self._false()
        return self.sk.boolean_and_many(
            [self.sk.scalar_eq_parallelized(c, 0) for c in a.chars])

    def _case_map(self, a: FheString, lo: int, hi: int, delta: int) -> FheString:
        """Add `delta` to chars in [lo, hi] (to_upper/to_lower core)."""
        out = []
        for c in a.chars:
            ge = self.sk.scalar_ge_parallelized(c, lo)
            le = self.sk.scalar_le_parallelized(c, hi)
            in_range = self.sk.boolean_and(ge, le)
            shifted = (self.sk.scalar_add_parallelized(c, delta) if delta > 0
                       else self.sk.scalar_sub_parallelized(c, -delta))
            out.append(self.sk.if_then_else_parallelized(in_range, shifted, c))
        return FheString(out, a.padded)

    def to_uppercase(self, a: FheString) -> FheString:
        return self._case_map(a, ord("a"), ord("z"), -32)

    def to_lowercase(self, a: FheString) -> FheString:
        return self._case_map(a, ord("A"), ord("Z"), 32)

    def concat(self, a: FheString, b: FheString) -> FheString:
        """Concatenation; exact when `a` is unpadded (strings/server_key
        concat semantics for padded lhs require a hidden rotate — see
        pattern family work)."""
        if a.padded:
            raise NotImplementedError("concat with padded lhs lands with the "
                                      "hidden-shift pattern ops")
        return FheString([c for c in a.chars] + [c for c in b.chars],
                         a.padded or b.padded)

    def repeat(self, a: FheString, n: int) -> FheString:
        if a.padded and n > 1:
            raise NotImplementedError("repeat of padded strings")
        return FheString([c for _ in range(n) for c in a.chars], a.padded)

    # ------------------------------------------------------------------
    # pattern family (server_key/pattern/)
    # ------------------------------------------------------------------

    def _window_match(self, a: FheString, pat, offset: int) -> BooleanBlock:
        """All pattern chars match a[offset:]; pat is str or FheString."""
        plen = len(pat) if isinstance(pat, str) else pat.max_len
        bools = []
        for j in range(plen):
            if offset + j >= a.max_len:
                return self._false()
            if isinstance(pat, str):
                bools.append(self._char_eq_clear(a.chars[offset + j], ord(pat[j])))
            else:
                bools.append(self._char_eq(a.chars[offset + j], pat.chars[j]))
        if not bools:
            return self._true()
        return self.sk.boolean_and_many(bools)

    def contains(self, a: FheString, pat) -> BooleanBlock:
        plen = len(pat) if isinstance(pat, str) else pat.max_len
        if plen == 0:
            return self._true()
        matches = [self._window_match(a, pat, off)
                   for off in range(a.max_len - plen + 1)]
        if not matches:
            return self._false()
        return self.sk.boolean_or_many(matches)

    def starts_with(self, a: FheString, pat) -> BooleanBlock:
        return self._window_match(a, pat, 0)

    def ends_with(self, a: FheString, pat) -> BooleanBlock:
        """Clear pattern only for padded strings (hidden length)."""
        plen = len(pat) if isinstance(pat, str) else pat.max_len
        if plen == 0:
            return self._true()
        if not a.padded:
            if plen > a.max_len:
                return self._false()
            return self._window_match(a, pat, a.max_len - plen)
        raise NotImplementedError("ends_with on padded strings needs the "
                                  "hidden-length alignment pass")

    def find(self, a: FheString, pat):
        """(found: BooleanBlock, index: RadixCiphertext) of first match."""
        plen = len(pat) if isinstance(pat, str) else pat.max_len
        nb = max(2, (max(a.max_len, 1).bit_length() + 1) // 2 + 1)
        offsets = range(a.max_len - plen + 1)
        matches = [self._window_match(a, pat, off) for off in offsets]
        if not matches:
            return self._false(), self.sk.create_trivial_radix(0, nb)
        found = self.sk.boolean_or_many(matches)
        # first-match gating: m'_i = m_i AND NOT(any m_j, j<i) via prefix OR
        prefix = []
        acc = None
        for m in matches:
            prefix.append(acc)
            acc = m if acc is None else self.sk.boolean_or(acc, m)
        index = self.sk.create_trivial_radix(0, nb)
        for i, (m, pre) in enumerate(zip(matches, prefix)):
            if i == 0 or pre is None:
                gated = m
            else:
                gated = self.sk.boolean_and(m, self.sk.boolean_not(pre))
            contrib = self.sk.if_then_else_parallelized(
                gated, self.sk.create_trivial_radix(i, nb),
                self.sk.create_trivial_radix(0, nb))
            index = self.sk.add_parallelized(index, contrib)
        return found, index
