"""v5 kernel fine-grained ablation sweep on the real TPU.

Runs every ablate mode in one process (one v32 build; each mode pays its own
kernel compile, cached on disk afterwards).  Results are WRONG under
ablation; timing only.  Usage: python perf_harness/_t_v5_ablate.py [tb] [B]
Env: V5_MODES=comma,list to restrict.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

MODES = [None, "rot", "dpl", "s1", "s1a", "mlb", "mid", "mida", "inv",
         "inva", "gar"]


def main():
    import jax

    from tfhe_tpu.ops import mxu, pallas_mxu
    from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
    from tfhe_tpu.utils.keycache import get_shortint_keys

    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_poly, n_in, k = P.polynomial_size, P.lwe_dimension, P.glwe_dimension

    _, sk = get_shortint_keys(P)
    nprimes = int(os.environ.get("V5_PRIMES", "3"))
    rb = int(os.environ.get("V5_ROUND_BITS", "15" if nprimes == 3 else "0"))
    plan = mxu.make_mxu_plan(n_poly, num_primes=nprimes, round_bits=rb)
    bhat, _ = mxu.bsk_eval_domain(sk._bsk_coeff, plan)
    t0 = time.time()
    v32, corr = mxu.middle_v5_from_eval_device(jax.device_put(bhat), plan)
    np.asarray(v32[0, 0, 0, 0, 0])
    print(f"# v32 build {time.time()-t0:.1f}s; tb={tb} B={b}", flush=True)

    rng = np.random.default_rng(3)

    def inputs(bb):
        mask = rng.integers(0, 2 * n_poly, (bb, n_in), dtype=np.uint64)
        body = rng.integers(0, 2 * n_poly, (bb,), dtype=np.uint64)
        lut = rng.integers(0, 1 << 63, (bb, k + 1, n_poly), dtype=np.uint64)
        return (jax.device_put(mask), jax.device_put(body),
                jax.device_put(lut))

    sets = [inputs(b) for _ in range(3)]
    modes = MODES
    if os.environ.get("V5_MODES"):
        raw = os.environ["V5_MODES"].split(",")
        modes = [None if m in ("none", "None") else m for m in raw]
    results = {}
    for mode in modes:
        run = jax.jit(functools.partial(
            pallas_mxu.blind_rotate_pallas_v5, plan=plan,
            base_log=P.pbs_base_log, levels=P.pbs_level, tb=tb, ablate=mode,
            jfold=os.environ.get("V5_JFOLD") == "1"))
        t0 = time.time()
        np.asarray(run(*sets[0], v32=v32, corr_mid=corr))
        print(f"# [{mode}] compile+first {time.time()-t0:.1f}s", flush=True)
        iters = 6
        t0 = time.time()
        for i in range(iters):
            out = run(*sets[i % 3], v32=v32, corr_mid=corr)
        np.asarray(out)
        dt = (time.time() - t0) / iters * 1e3
        results[str(mode)] = dt
        print(f"[{mode}] {dt:.1f} ms/batch({b})", flush=True)

    base = results.get("None")
    print("\n=== ablation summary (ms saved vs baseline) ===")
    for m, v in results.items():
        if base and m != "None":
            print(f"{m:6s} {v:8.1f} ms  saved {base - v:7.1f} ms")
        else:
            print(f"{m:6s} {v:8.1f} ms  (baseline)")


if __name__ == "__main__":
    main()
