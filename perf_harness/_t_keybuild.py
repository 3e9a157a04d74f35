"""Profile the v5 MXU key build (the 747.8s in BENCH_r02) stage by stage."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
    from tfhe_tpu.utils.keycache import get_shortint_keys
    from tfhe_tpu.core import keygen as kg
    from tfhe_tpu.ops import mxu
    from tfhe_tpu.utils import csprng

    t0 = time.time()
    ck, sk = get_shortint_keys(P)
    print(f"keygen/load: {time.time()-t0:.1f}s")

    t0 = time.time()
    bsk = kg.generate_lwe_bootstrap_key(
        ck.lwe_secret_key, ck.glwe_secret_key, P.core.pbs_decomp,
        P.glwe_noise,
        csprng.EncryptionRandomGenerator(
            0x7FEE, csprng.DeterministicSeeder(0x7FEE ^ 0xB5297A4D)),
        P.bits)
    print(f"bsk regen: {time.time()-t0:.1f}s")

    nprimes, rb = 3, 15
    t0 = time.time()
    mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=nprimes,
                              round_bits=rb)
    print(f"make_mxu_plan: {time.time()-t0:.1f}s")

    t0 = time.time()
    bhat, _ = mxu.bsk_eval_domain(bsk, mplan, mont=False)
    print(f"bsk_eval_domain (host): {time.time()-t0:.1f}s  "
          f"bhat {bhat.shape} {bhat.nbytes/1e6:.0f} MB")

    t0 = time.time()
    bhat_dev = jax.device_put(bhat)
    np.asarray(bhat_dev[0, 0, 0, 0, 0, 0])
    print(f"device_put(bhat): {time.time()-t0:.1f}s")

    t0 = time.time()
    v32, corr = mxu.middle_v5_from_eval_device(bhat_dev, mplan)
    np.asarray(v32[(0,) * v32.ndim])
    np.asarray(corr[(0,) * corr.ndim])
    print(f"middle_v5_from_eval_device: {time.time()-t0:.1f}s  "
          f"v32 {v32.shape} {v32.size*4/1e9:.2f} GB")


if __name__ == "__main__":
    main()
