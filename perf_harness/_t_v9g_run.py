"""Round-5: grid-scheduled fused multi-bit v9g blind-rotate throughput on
the real chip.  TB/B/SS/ABL/SF envs; uses the TPU g=2 set's ServerKey
(keycached, mask-floored)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tfhe_tpu.shortint import TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys
from tfhe_tpu.ops import mxu, server as srv
from tfhe_tpu.ops import pallas_mxu as pm

TB = int(os.environ.get("TB", "128"))
B = int(os.environ.get("B", "512"))
SS = int(os.environ.get("SS", "4"))
ABL = os.environ.get("ABL") or None
TL = os.environ.get("TL") == "1"
ITERS = int(os.environ.get("ITERS", "4"))
G = P.grouping_factor

t0 = time.time()
ck, sk = get_shortint_keys(P)
print(f"keygen/load: {time.time()-t0:.1f}s (floored rb={sk._mb_floored})",
      flush=True)
t0 = time.time()
rb = 16
mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=rb)
bhat = mxu.multibit_eval_domain(sk._mb_bsk_coeff, P.core.pbs_decomp, mplan, G)
print(f"host eval domain: {time.time()-t0:.1f}s bhat={bhat.shape}", flush=True)
t0 = time.time()
v32, corr = mxu.middle_v9_from_eval_device(jax.device_put(bhat), mplan,
                                           P.pbs_base_log, G, ss=SS,
                                           subset_major=("t_lanes" if TL
                                                         else True))
np.asarray(v32[0, 0, 0, 0])
print(f"middle build: {time.time()-t0:.1f}s v32={v32.shape} "
      f"{v32.size*4/2**30:.2f} GiB logical", flush=True)

N = P.polynomial_size
n_in = P.lwe_dimension
n_g = n_in // G
rng = np.random.default_rng(1)
NSETS = ITERS + 1
degs = [jnp.asarray(rng.integers(0, 2 * N, (B, n_g, 1 << G),
                                 dtype=np.uint64))
        for _ in range(NSETS)]
bodys = [jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.uint64))
         for _ in range(NSETS)]
luts = [jnp.asarray(rng.integers(0, 1 << 5, (B, 2, N), dtype=np.uint64)
                    << np.uint64(59)) for _ in range(NSETS)]


def run(deg, body, lut, v32, corr):
    return pm.blind_rotate_pallas_v9g(deg, body, lut, v32, corr, mplan,
                                      P.pbs_base_log, P.pbs_level, G, tb=TB,
                                      ss=SS, ablate=ABL, t_lanes=TL)


f = jax.jit(run)
t0 = time.time()
out = f(degs[-1], bodys[-1], luts[-1], v32, corr)
np.asarray(out)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for i in range(ITERS):
    out = f(degs[i], bodys[i], luts[i], v32, corr)
np.asarray(out)
dt = time.time() - t0
print(f"v9g g={G} tb={TB} B={B} ss={SS} tl={TL} ablate={ABL}: "
      f"{B*ITERS/dt:.1f} BR/s  ({dt/ITERS*1e3:.1f} ms/batch)", flush=True)
