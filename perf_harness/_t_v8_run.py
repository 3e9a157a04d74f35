"""Round-4: v7 vs v8 blind-rotate throughput on the real chip."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tfhe_tpu_jax"))
import numpy as np, jax, jax.numpy as jnp
from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys
from tfhe_tpu.ops import mxu
from tfhe_tpu.ops import pallas_mxu as pm

KER = os.environ.get("K", "v8")          # v7 | v8
TB = int(os.environ.get("TB", "256"))
B = int(os.environ.get("B", "512"))
SS = int(os.environ.get("SS", "4"))
ABL = os.environ.get("ABL") or None

ck, sk = get_shortint_keys(P)
mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=15)
bhat, _ = mxu.bsk_eval_domain(sk._bsk_coeff, mplan)
bd = jax.device_put(bhat)
t0 = time.time()
if KER == "v8":
    v32, corr = mxu.middle_v8_from_eval_device(bd, mplan, P.pbs_base_log, ss=SS)
else:
    v32, corr = mxu.middle_v5_from_eval_device(bd, mplan)
v32.block_until_ready()
print(f"middle build: {time.time()-t0:.1f}s v32={v32.shape} "
      f"{v32.size*4/2**30:.2f} GiB logical", flush=True)

n_in = P.core.lwe_dimension if hasattr(P, 'core') else 918
n_in = sk._bsk_coeff.data.shape[0]
N = P.polynomial_size
rng = np.random.default_rng(1)
mask = jnp.asarray(rng.integers(0, 2*N, (B, n_in), dtype=np.uint64))
body = jnp.asarray(rng.integers(0, 2*N, (B,), dtype=np.uint64))
lut = jnp.asarray((rng.integers(0, 1 << 5, (B, 2, N), dtype=np.uint64) << np.uint64(59)))

def run():
    if KER == "v8":
        return pm.blind_rotate_pallas_v8(mask, body, lut, v32, corr, mplan,
                                         P.pbs_base_log, P.pbs_level, tb=TB,
                                         trunc_acc=True, ss=SS, ablate=ABL)
    return pm.blind_rotate_pallas_v5(mask, body, lut, v32, corr, mplan,
                                     P.pbs_base_log, P.pbs_level, tb=TB,
                                     jfold=True, trunc_acc=True, ablate=ABL)
f = jax.jit(run)
t0 = time.time(); out = f(); out.block_until_ready()
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
iters = 4
t0 = time.time()
for _ in range(iters):
    out = f()
out.block_until_ready()
dt = time.time() - t0
print(f"{KER} tb={TB} B={B} ss={SS} ablate={ABL}: {B*iters/dt:.1f} BR/s  ({dt/iters*1e3:.1f} ms/batch)", flush=True)
