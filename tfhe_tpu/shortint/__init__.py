"""shortint: exact small-integer FHE over single LWE ciphertexts.

TPU-first analog of tfhe::shortint (SURVEY.md §2.3): message + carry space in
one ciphertext, programmable bootstrapping with batch-first LUT application.
"""

from .ciphertext import Ciphertext
from .client_key import ClientKey
from .params import (
    DEFAULT_PARAMS,
    PARAM_MESSAGE_2_CARRY_2_KS_PBS,
    TEST_PARAM_MESSAGE_2_CARRY_2,
    TEST_PARAM_MESSAGE_2_CARRY_2_KS32,
    TEST_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2,
    TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_GPU_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_GPU_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_GPU_MULTI_BIT_GROUP_4_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_GPU_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS32_PBS_TUNIFORM_2M128,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_GAUSSIAN_2M128,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M40,
    V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M64,
    V1_4_PARAM_MESSAGE_3_CARRY_3_KS_PBS_TUNIFORM_2M128,
    V1_4_PARAM_MESSAGE_4_CARRY_4_KS_PBS_TUNIFORM_2M128,
    MultiBitPBSParameters,
    ShortintParams,
)
try:  # server-side surface needs jax; client-only environments skip it
    from .server_key import LookupTable, ServerKey

    def gen_keys(params=DEFAULT_PARAMS, seed=None):
        ck = ClientKey(params, seed)
        sk = ServerKey(ck, seed)
        return ck, sk
except ImportError:  # pragma: no cover - exercised by test_client_only
    pass
