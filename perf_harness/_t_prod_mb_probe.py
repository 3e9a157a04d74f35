"""Why is the multibit product path 25 PBS/s when the kernel does 387 BR/s?
Times each stage of apply_lookup_table_batch -> ks_pbs_batch_mxu_multibit."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tfhe_tpu.shortint import TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys
from tfhe_tpu.ops import mxu, server as srv, pallas_mxu as pm

B = int(os.environ.get("B", "512"))
ck, sk = get_shortint_keys(P)
print("use_mxu_multibit:", sk.use_mxu_multibit, flush=True)
t0 = time.time(); v32, corr, mplan = sk._ensure_mxu_mb()
np.asarray(v32[(0,)*v32.ndim]); print(f"ensure_mxu_mb: {time.time()-t0:.1f}s tl={getattr(sk, '_mxu_mb_tl', None)}", flush=True)
lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
sets = [[ck.encrypt((i + s) % 4) for i in range(B)] for s in range(3)]

# full product path
t0 = time.time(); out = sk.apply_lookup_table_batch(sets[0], lut)
_ = np.asarray(out[0].data); print(f"product warm: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for i in range(2):
    out = sk.apply_lookup_table_batch(sets[(i+1) % 3], lut)
_ = np.asarray(out[-1].data)
print(f"product steady: {(time.time()-t0)/2:.2f}s/batch", flush=True)

# pre-stacked direct call
batch = jnp.asarray(np.stack([np.asarray(c.data) for c in sets[0]]))
lut_b = jnp.asarray(np.broadcast_to(lut.acc, (B,) + lut.acc.shape))
p = P
def direct(bc):
    return srv.ks_pbs_batch_mxu_multibit(
        bc, lut_b, sk.ksk, v32, corr, mplan, p.ks_base_log, p.ks_level,
        p.pbs_base_log, p.pbs_level, p.grouping_factor, p.bits, True,
        128, False, ss=4, t_lanes=getattr(sk, "_mxu_mb_tl", False))
t0 = time.time(); o = direct(batch); np.asarray(o)
print(f"direct warm: {time.time()-t0:.1f}s", flush=True)
b2 = [jnp.asarray(np.stack([np.asarray(c.data) for c in sets[i]])) for i in range(3)]
t0 = time.time()
for i in range(2):
    o = direct(b2[(i+1) % 3])
np.asarray(o)
print(f"direct steady: {(time.time()-t0)/2:.2f}s/batch", flush=True)

# jitted end-to-end
fj = jax.jit(direct)
t0 = time.time(); o = fj(b2[0]); np.asarray(o)
print(f"jit warm: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for i in range(2):
    o = fj(b2[(i+1) % 3])
np.asarray(o)
print(f"jit steady: {(time.time()-t0)/2:.2f}s/batch", flush=True)
