"""FheUint / FheInt / FheBool with operator overloads.

Analog of high_level_api/integers/ (unsigned/ops.rs:72 operator impls with
per-op dispatch to the thread-global server key).  Widths are blocks of
log2(message_modulus) bits (32 blocks of 2 bits for FheUint64 at 2_2).
"""

from __future__ import annotations

from ..integer.ciphertext import BooleanBlock, RadixCiphertext
from .global_state import internal_server_key


class FheBool:
    def __init__(self, inner: BooleanBlock):
        self.inner = inner

    @classmethod
    def encrypt(cls, value: bool, client_key) -> "FheBool":
        return cls(client_key.integer_key.encrypt_bool(bool(value)))

    def decrypt(self, client_key) -> bool:
        return client_key.integer_key.decrypt_bool(self.inner)

    def __and__(self, other: "FheBool") -> "FheBool":
        sk = internal_server_key().integer_key
        out = sk.key.bitand(self.inner.block, other.inner.block)
        return FheBool(BooleanBlock(out))

    def __or__(self, other: "FheBool") -> "FheBool":
        sk = internal_server_key().integer_key
        out = sk.key.bitor(self.inner.block, other.inner.block)
        return FheBool(BooleanBlock(out))

    def __xor__(self, other: "FheBool") -> "FheBool":
        sk = internal_server_key().integer_key
        out = sk.key.bitxor(self.inner.block, other.inner.block)
        return FheBool(BooleanBlock(out))

    def if_then_else(self, a: "FheUintBase", b: "FheUintBase"):
        sk = internal_server_key().integer_key
        out = sk.if_then_else_parallelized(self.inner, a.inner, b.inner)
        return type(a)(out)


class FheUintBase:
    NUM_BITS: int = 0

    def __init__(self, inner: RadixCiphertext):
        self.inner = inner

    # -- encryption --------------------------------------------------------

    @classmethod
    def num_blocks(cls, params) -> int:
        bits_per_block = (params.message_modulus - 1).bit_length()
        return cls.NUM_BITS // bits_per_block

    @classmethod
    def encrypt(cls, value: int, client_key) -> "FheUintBase":
        ik = client_key.integer_key
        n = cls.num_blocks(ik.params)
        return cls(ik.encrypt_radix(value, n))

    @classmethod
    def encrypt_trivial(cls, value: int) -> "FheUintBase":
        sk = internal_server_key().integer_key
        n = cls.num_blocks(sk.params)
        return cls(sk.create_trivial_radix(value, n))

    def decrypt(self, client_key) -> int:
        return client_key.integer_key.decrypt_radix(self.inner)

    # -- arithmetic --------------------------------------------------------

    def _sk(self):
        return internal_server_key().integer_key

    def _coerce(self, other):
        if isinstance(other, FheUintBase):
            return other.inner, False
        return int(other), True

    def __add__(self, other):
        sk = self._sk()
        o, scalar = self._coerce(other)
        out = sk.scalar_add_parallelized(self.inner, o) if scalar \
            else sk.add_parallelized(self.inner, o)
        return type(self)(out)

    __radd__ = __add__

    def __sub__(self, other):
        sk = self._sk()
        o, scalar = self._coerce(other)
        out = sk.scalar_sub_parallelized(self.inner, o) if scalar \
            else sk.sub_parallelized(self.inner, o)
        return type(self)(out)

    def __mul__(self, other):
        sk = self._sk()
        o, scalar = self._coerce(other)
        out = sk.scalar_mul_parallelized(self.inner, o) if scalar \
            else sk.mul_parallelized(self.inner, o)
        return type(self)(out)

    __rmul__ = __mul__

    def __neg__(self):
        return type(self)(self._sk().neg_parallelized(self.inner))

    def __and__(self, other):
        o, _ = self._coerce(other)
        return type(self)(self._sk().bitand_parallelized(self.inner, o))

    def __or__(self, other):
        o, _ = self._coerce(other)
        return type(self)(self._sk().bitor_parallelized(self.inner, o))

    def __xor__(self, other):
        o, _ = self._coerce(other)
        return type(self)(self._sk().bitxor_parallelized(self.inner, o))

    def __invert__(self):
        return type(self)(self._sk().bitnot(self.inner))

    def __lshift__(self, amount: int):
        return type(self)(self._sk().scalar_left_shift_parallelized(self.inner, int(amount)))

    def __rshift__(self, amount: int):
        return type(self)(self._sk().scalar_right_shift_parallelized(self.inner, int(amount)))

    # -- comparisons -------------------------------------------------------

    def eq(self, other) -> FheBool:
        return FheBool(self._sk().eq_parallelized(self.inner, other.inner))

    def ne(self, other) -> FheBool:
        return FheBool(self._sk().ne_parallelized(self.inner, other.inner))

    def lt(self, other) -> FheBool:
        return FheBool(self._sk().lt_parallelized(self.inner, other.inner))

    def le(self, other) -> FheBool:
        return FheBool(self._sk().le_parallelized(self.inner, other.inner))

    def gt(self, other) -> FheBool:
        return FheBool(self._sk().gt_parallelized(self.inner, other.inner))

    def ge(self, other) -> FheBool:
        return FheBool(self._sk().ge_parallelized(self.inner, other.inner))

    def min(self, other):
        return type(self)(self._sk().min_parallelized(self.inner, other.inner))

    def max(self, other):
        return type(self)(self._sk().max_parallelized(self.inner, other.inner))


class FheUint2(FheUintBase):
    NUM_BITS = 2


class FheUint4(FheUintBase):
    NUM_BITS = 4


class FheUint8(FheUintBase):
    NUM_BITS = 8


class FheUint16(FheUintBase):
    NUM_BITS = 16


class FheUint32(FheUintBase):
    NUM_BITS = 32


class FheUint64(FheUintBase):
    NUM_BITS = 64


class FheUint128(FheUintBase):
    NUM_BITS = 128


class FheIntBase(FheUintBase):
    """Two's-complement signed integers (high_level_api/integers/signed/)."""

    @classmethod
    def encrypt(cls, value: int, client_key) -> "FheIntBase":
        ik = client_key.integer_key
        n = cls.num_blocks(ik.params)
        modulus = ik.params.message_modulus ** n
        return cls(ik.encrypt_radix(value % modulus, n))

    def decrypt(self, client_key) -> int:
        ik = client_key.integer_key
        v = ik.decrypt_radix(self.inner)
        modulus = ik.params.message_modulus ** self.inner.num_blocks
        return v - modulus if v >= modulus // 2 else v


class FheInt8(FheIntBase):
    NUM_BITS = 8


class FheInt16(FheIntBase):
    NUM_BITS = 16


class FheInt32(FheIntBase):
    NUM_BITS = 32


class FheInt64(FheIntBase):
    NUM_BITS = 64
