"""Round-4: profile the warm-boot path (VERDICT task 4 baseline)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tfhe_tpu_jax"))
t00 = time.time()
import numpy as np, jax
from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys
from tfhe_tpu.ops import mxu
print(f"imports: {time.time()-t00:.1f}s", flush=True)
t0 = time.time(); ck, sk = get_shortint_keys(P); print(f"keycache load: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
mplan = mxu.make_mxu_plan(P.polynomial_size, num_primes=3, round_bits=15)
print(f"make_mxu_plan: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
bhat, _ = mxu.bsk_eval_domain(sk._bsk_coeff, mplan)
print(f"bsk_eval_domain (host): {time.time()-t0:.1f}s shape={bhat.shape}", flush=True)
t0 = time.time(); bd = jax.device_put(bhat); bd.block_until_ready()
print(f"device_put: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
v32, corr = mxu.middle_v5_from_eval_device(bd, mplan)
v32.block_until_ready(); corr.block_until_ready()
print(f"middle_v5_from_eval_device: {time.time()-t0:.1f}s v32={v32.shape}", flush=True)
print(f"TOTAL: {time.time()-t00:.1f}s", flush=True)
