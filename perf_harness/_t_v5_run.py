"""v5 byte-limb kernel on the real TPU: compile, spot-check, timing.

Run from repo root: python perf_harness/_t_v5_run.py [tb] [B]
Env: V5_PRIMES=3|4  V5_ROUND_BITS  V5_ABLATE  V5_SKIP_CHECK=1
Uses the cached BSK from .keys/mxu_2_2_r2.npz.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tfhe_tpu.ops import mxu, pallas_mxu
    from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P

    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_poly, n_in, k = P.polynomial_size, P.lwe_dimension, P.glwe_dimension

    from tfhe_tpu.utils.keycache import get_shortint_keys
    _, sk = get_shortint_keys(P)
    bsk = sk._bsk_coeff
    nprimes = int(os.environ.get("V5_PRIMES", "3"))
    rb = int(os.environ.get("V5_ROUND_BITS", "15" if nprimes == 3 else "0"))
    plan = mxu.make_mxu_plan(n_poly, num_primes=nprimes, round_bits=rb)
    t0 = time.time()
    bhat, _ = mxu.bsk_eval_domain(bsk, plan)
    print(f"# host eval-domain {time.time()-t0:.1f}s "
          f"({bhat.nbytes/1e6:.0f} MB); tb={tb} B={b} primes={nprimes} "
          f"rb={rb}", flush=True)
    t0 = time.time()
    v32, corr = mxu.middle_v5_from_eval_device(jax.device_put(bhat), plan)
    np.asarray(v32[0, 0, 0, 0, 0]); np.asarray(corr[0, 0, 0, 0])
    print(f"# device v32 build {time.time()-t0:.1f}s "
          f"({v32.nbytes/1e9:.2f} GB + corr {corr.nbytes/1e6:.0f} MB)",
          flush=True)
    m_ref = None
    if os.environ.get("V5_SKIP_CHECK") != "1":
        t0 = time.time()
        m_ref = mxu.middle_from_eval_device(jax.device_put(bhat), plan)
        np.asarray(m_ref[0, 0, 0, 0, 0, 0])
        print(f"# reference M build {time.time()-t0:.1f}s", flush=True)

    import functools
    ablate = os.environ.get("V5_ABLATE") or None
    if ablate:
        os.environ["V5_SKIP_CHECK"] = "1"
    print(f"# ABLATE={ablate}", flush=True)
    run = jax.jit(functools.partial(
        pallas_mxu.blind_rotate_pallas_v5, plan=plan, base_log=P.pbs_base_log,
        levels=P.pbs_level, tb=tb, ablate=ablate,
        jfold=os.environ.get("V5_JFOLD") == "1",
        trunc_acc=os.environ.get("V5_TRUNC") == "1"))

    rng = np.random.default_rng(3)

    def inputs(bb):
        mask = rng.integers(0, 2 * n_poly, (bb, n_in), dtype=np.uint64)
        body = rng.integers(0, 2 * n_poly, (bb,), dtype=np.uint64)
        lut = rng.integers(0, 1 << 63, (bb, k + 1, n_poly), dtype=np.uint64)
        if os.environ.get("V5_TRUNC") == "1":
            lut &= np.uint64(0xFFFFFFFF00000000)
        return (jax.device_put(mask), jax.device_put(body),
                jax.device_put(lut))

    if os.environ.get("V5_SKIP_CHECK") != "1":
        sm = inputs(tb)
        t0 = time.time()
        got = np.asarray(run(*sm, v32=v32, corr_mid=corr))
        print(f"# small compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        want = np.asarray(mxu.blind_rotate_mxu(
            sm[0], sm[1], sm[2], m_ref, plan, P.pbs_base_log, P.pbs_level))
        print(f"# ref compile+run {time.time()-t0:.1f}s; "
              f"MATCH={np.array_equal(got, want)}", flush=True)

    sets = [inputs(b) for _ in range(3)]
    t0 = time.time()
    out = run(*sets[0], v32=v32, corr_mid=corr)
    np.asarray(out)
    print(f"# full compile+first {time.time()-t0:.1f}s", flush=True)
    iters = 3
    t0 = time.time()
    for i in range(iters):
        out = run(*sets[i % 3], v32=v32, corr_mid=corr)
    np.asarray(out)
    dt = (time.time() - t0) / iters
    print(f"v5 blind_rotate: {dt*1e3:.1f} ms/batch({b}) -> {b/dt:.1f} BR/s",
          flush=True)


if __name__ == "__main__":
    main()
