"""Round-4: v7 vs v8 blind-rotate throughput on the real chip.

K=v7|v8|both  TB=tile batch  B=batch  SS=macro substeps  ABL=ablate mode
Inputs vary per timed iteration (axon dedups identical executions); the
middle tensors are passed as jit ARGUMENTS (closure capture would bake
2.9 GB of constants into the HLO and blow up compile time).
"""
import functools
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tfhe_tpu_jax"))
import numpy as np, jax, jax.numpy as jnp
from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys
from tfhe_tpu.ops import mxu
from tfhe_tpu.ops import pallas_mxu as pm

KER = os.environ.get("K", "both")        # v7 | v8 | both
TB = int(os.environ.get("TB", "256"))
B = int(os.environ.get("B", "512"))
SS = int(os.environ.get("SS", "4"))
ABL = os.environ.get("ABL") or None
ITERS = int(os.environ.get("ITERS", "4"))

ck, sk = get_shortint_keys(P)
mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=15)
bhat, _ = mxu.bsk_eval_domain(sk._bsk_coeff, mplan)
bd = jax.device_put(bhat)
n_in = sk._bsk_coeff.data.shape[0]
N = P.polynomial_size
rng = np.random.default_rng(1)
NSETS = ITERS + 1
masks = [jnp.asarray(rng.integers(0, 2 * N, (B, n_in), dtype=np.uint64))
         for _ in range(NSETS)]
bodys = [jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
         for _ in range(NSETS)]
luts = [jnp.asarray(rng.integers(0, 1 << 5, (B, 2, N), dtype=np.uint64)
                    << np.uint64(59)) for _ in range(NSETS)]


def run_v8(mask, body, lut, v32, corr):
    return pm.blind_rotate_pallas_v8(
        mask, body, lut, v32, corr, mplan, P.pbs_base_log,
        P.pbs_level, tb=TB, trunc_acc=True, ss=SS, ablate=ABL)


def run_v7(mask, body, lut, v32, corr):
    return pm.blind_rotate_pallas_v5(
        mask, body, lut, v32, corr, mplan, P.pbs_base_log, P.pbs_level,
        tb=TB, jfold=True, trunc_acc=True, ablate=ABL)


def measure(ker):
    t0 = time.time()
    if ker == "v8":
        v32, corr = mxu.middle_v8_from_eval_device(bd, mplan, P.pbs_base_log,
                                                   ss=SS)
    else:
        v32, corr = mxu.middle_v5_from_eval_device(bd, mplan)
    np.asarray(v32[0, 0, 0, 0])
    print(f"[{ker}] middle build: {time.time()-t0:.1f}s v32={v32.shape} "
          f"{v32.size*4/2**30:.2f} GiB logical", flush=True)
    f = jax.jit(run_v8 if ker == "v8" else run_v7)
    t0 = time.time()
    out = f(masks[-1], bodys[-1], luts[-1], v32, corr)
    np.asarray(out)
    print(f"[{ker}] compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(ITERS):
        out = f(masks[i], bodys[i], luts[i], v32, corr)
    np.asarray(out)            # sync (block_until_ready returns early on axon)
    dt = time.time() - t0
    print(f"[{ker}] tb={TB} B={B} ss={SS} ablate={ABL}: {B*ITERS/dt:.1f} BR/s"
          f"  ({dt/ITERS*1e3:.1f} ms/batch)", flush=True)


if KER in ("v7", "both"):
    measure("v7")
if KER in ("v8", "both"):
    measure("v8")
