"""integer: arbitrary-precision encrypted integers as radix vectors of
shortint blocks (TPU batch-first analog of tfhe::integer, SURVEY.md §2.4)."""

from .ciphertext import BooleanBlock, RadixCiphertext, SignedRadixCiphertext
from .client_key import ClientKey

try:  # server-side surface needs jax; client-only environments skip it
    from .crt import CrtCiphertext, crt_reconstruct
    from .server_key import ServerKey

    def gen_keys(params=None, seed=None):
        from ..shortint.params import DEFAULT_PARAMS

        ck = ClientKey(params or DEFAULT_PARAMS, seed)
        sk = ServerKey(ck, seed)
        return ck, sk
except ImportError:  # pragma: no cover - exercised by test_client_only
    pass
