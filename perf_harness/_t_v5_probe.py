"""Probe: Mosaic legality of the v5-fix building blocks on real hardware.
1) u32 shift + bitcast->i8 inside a Pallas kernel
2) batched dot_general contracting dim 1 of BOTH operands (K on sublanes)
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K32, M, T = 8, 64, 32, 64
K = 4 * K32

def kern(v_ref, r_ref, o_ref):
    w = (v_ref[:] >> jnp.uint32(8)) | (v_ref[:] << jnp.uint32(24))  # rotate probe: mix shifts
    lhs = pltpu.bitcast(w, jnp.int8)                # (B, K, M)
    o_ref[:] = jax.lax.dot_general(
        lhs, r_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)           # (B, M, T)

v = np.random.randint(0, 2**32, (B, K32, M), dtype=np.uint64).astype(np.uint32)
r = np.random.randint(-128, 128, (B, K, T)).astype(np.int8)

out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((B, M, T), jnp.int32),
)(jnp.asarray(v), jnp.asarray(r))
got = np.asarray(out)

# reference
w = (v >> np.uint32(8)) | (v << np.uint32(24))
lhs = np.zeros((B, K, M), np.int8)
for e in range(4):
    lhs[:, e::4][:, :K32] = 0  # placeholder
# byte-minor interleave: row kk*4+b = byte b of row kk
lb = ((w[:, :, None, :] >> (8 * np.arange(4))[None, None, :, None]) & 0xFF).astype(np.uint8).astype(np.int8)
lhs = lb.transpose(0, 1, 2, 3).reshape(B, K, M)
want = np.einsum('bkm,bkt->bmt', lhs.astype(np.int32), r.astype(np.int32))
print("match:", np.array_equal(got, want))
