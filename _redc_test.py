import numpy as np
from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.ops import mxu, pallas_mxu
from tfhe_tpu.utils.csprng import (DeterministicSeeder,
    EncryptionRandomGenerator, SecretRandomGenerator, TUniform)
N, N_IN, K, BL, LV = 512, 4, 1, 23, 1
gen_s = SecretRandomGenerator(123)
lwe_sk = kg.generate_binary_lwe_secret_key(N_IN, gen_s)
glwe_sk = kg.generate_binary_glwe_secret_key(K, N, gen_s)
gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
bsk = kg.generate_lwe_bootstrap_key(lwe_sk, glwe_sk, DecompParams(BL, LV),
                                    TUniform(3), gen_e)
m_plain, plan = mxu.bsk_to_mxu(bsk)
m_mont, _ = mxu.bsk_to_mxu(bsk, plan, mont=True)
rng = np.random.default_rng(5)
mask = rng.integers(0, 2 * N, (4, N_IN), dtype=np.uint64)
body = rng.integers(0, 2 * N, (4,), dtype=np.uint64)
lut = rng.integers(0, 1 << 64, (4, K + 1, N), dtype=np.uint64)
want = np.asarray(mxu.blind_rotate_mxu(mask, body, lut, m_plain, plan, BL, LV))
got = np.asarray(pallas_mxu.blind_rotate_pallas_v3(
    mask, body, lut, m_mont, plan, BL, LV, tb=2, interpret=True,
    fold_mode="redc"))
print("REDC MATCH:", np.array_equal(got, want))
