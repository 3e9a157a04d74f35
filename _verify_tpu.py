import numpy as np
from tfhe_tpu import shortint
from tfhe_tpu.shortint.compression import CompressionKey
from tfhe_tpu.utils.keycache import get_shortint_keys

p = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
ck, sk = get_shortint_keys(p)
comp = CompressionKey(ck, seed=0xC0FF)
msgs = [i % 4 for i in range(64)]
cts = [ck.encrypt(m) for m in msgs]
packed = comp.compress(cts)
outs = comp.decompress(packed)
dec = [ck.decrypt(o) for o in outs]
print("prod TPU decompress roundtrip:", "ok" if dec == msgs else f"MISMATCH {dec[:8]}")
