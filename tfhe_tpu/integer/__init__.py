"""integer: arbitrary-precision encrypted integers as radix vectors of
shortint blocks (TPU batch-first analog of tfhe::integer, SURVEY.md §2.4)."""

from .ciphertext import BooleanBlock, RadixCiphertext, SignedRadixCiphertext
from .crt import CrtCiphertext, crt_reconstruct
from .client_key import ClientKey
from .server_key import ServerKey


def gen_keys(params=None, seed=None):
    from ..shortint.params import DEFAULT_PARAMS

    ck = ClientKey(params or DEFAULT_PARAMS, seed)
    sk = ServerKey(ck, seed)
    return ck, sk
