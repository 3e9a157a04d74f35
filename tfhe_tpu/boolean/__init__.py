"""boolean: the original TFHE gate API (and/nand/or/nor/xor/xnor/not/mux).

Behavioral analog of tfhe::boolean (SURVEY.md §2.5): ciphertexts encode
true/false as +-q/8 on the torus; each binary gate is one linear combination
followed by a sign-extracting PBS + KS.

TPU-first redesign: instead of the reference's dedicated u32-torus engine
(boolean/engine/mod.rs:53), gates run on the shared u64 exact-NTT pipeline
with a constant sign-LUT, and gate batches are evaluated in one fused
ks_pbs_batch call (`*_packed` methods).  Trivial ciphertexts short-circuit
(boolean/ciphertext Trivial variant).
"""

from .client_key import Ciphertext, ClientKey
from .server_key import ServerKey
from .params import DEFAULT_PARAMETERS, TEST_PARAMETERS


def gen_keys(params=DEFAULT_PARAMETERS, seed=None):
    ck = ClientKey(params, seed)
    sk = ServerKey(ck, seed)
    return ck, sk
