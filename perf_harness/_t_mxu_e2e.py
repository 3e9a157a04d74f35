"""End-to-end MXU blind-rotate timing at production 2_2 shape (XLA prototype).

Builds (or loads from .keys/) the coefficient BSK + middle-collapse tensors
for V1_4 2_2, then times blind_rotate_mxu vs blind_rotate_pallas_v2 on the
real chip.  Run from repo root:  python perf_harness/_t_mxu_e2e.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tfhe_tpu.core import keygen as kg
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.ops import mxu, server as srv
    from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
    from tfhe_tpu.utils.csprng import (
        DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_poly, n_in, k = P.polynomial_size, P.lwe_dimension, P.glwe_dimension

    cache = ".keys/mxu_2_2_r2.npz"
    os.makedirs(".keys", exist_ok=True)
    t0 = time.time()
    if os.path.exists(cache):
        z = np.load(cache)
        m_limbs, bsk_data = z["m_limbs"], z["bsk_data"]
        plan = mxu.make_mxu_plan(n_poly)
        print(f"# loaded cache in {time.time()-t0:.1f}s", flush=True)
    else:
        gen_s = SecretRandomGenerator(0xABCD)
        lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
        glwe_sk = kg.generate_binary_glwe_secret_key(k, n_poly, gen_s)
        gen_e = EncryptionRandomGenerator(77, DeterministicSeeder(88))
        bsk = kg.generate_lwe_bootstrap_key(
            lwe_sk, glwe_sk, DecompParams(P.pbs_base_log, P.pbs_level),
            P.glwe_noise, gen_e)
        print(f"# bsk gen {time.time()-t0:.1f}s", flush=True)
        t1 = time.time()
        m_limbs, plan = mxu.bsk_to_mxu(bsk)
        print(f"# middle build {time.time()-t1:.1f}s "
              f"({m_limbs.nbytes/1e9:.2f} GB)", flush=True)
        bsk_data = bsk.data
        np.savez(cache, m_limbs=m_limbs, bsk_data=bsk_data)
    plan = mxu.make_mxu_plan(n_poly)

    rng = np.random.default_rng(3)
    t1 = time.time()
    m_dev = jax.device_put(m_limbs)
    np.asarray(m_dev[0, 0, 0, 0, 0])
    print(f"# device_put m_limbs {time.time()-t1:.1f}s", flush=True)

    import functools
    run = jax.jit(functools.partial(
        mxu.blind_rotate_mxu, plan=plan, base_log=P.pbs_base_log,
        levels=P.pbs_level))

    def inputs():
        mask = rng.integers(0, 2 * n_poly, (b, n_in), dtype=np.uint64)
        body = rng.integers(0, 2 * n_poly, (b,), dtype=np.uint64)
        lut = rng.integers(0, 1 << 63, (b, k + 1, n_poly), dtype=np.uint64)
        return (jax.device_put(mask), jax.device_put(body),
                jax.device_put(lut))

    sets = [inputs() for _ in range(3)]
    t1 = time.time()
    out = run(*sets[0], m_limbs=m_dev)
    np.asarray(out)
    print(f"# compile+first {time.time()-t1:.1f}s", flush=True)

    iters = 3
    t1 = time.time()
    for i in range(iters):
        out = run(*sets[i % 3], m_limbs=m_dev)
    np.asarray(out)
    dt = (time.time() - t1) / iters
    print(f"blind_rotate_mxu: {dt*1e3:.1f} ms/batch({b}) -> "
          f"{b/dt:.1f} BR/s", flush=True)


if __name__ == "__main__":
    main()
