"""Probe: lane-tiled V (broadcast_to+reshape) + lane-dependent variable byte
shifts + bitcast + (1,1)-dot == the 8-block stacked mid (block d<7 = diag d)."""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_, K32, M, T = 8, 64, 32, 64
K = 4 * K32
v = np.random.randint(0, 2**32, (B_, K32, M), dtype=np.uint64).astype(np.uint32)
r = np.random.randint(-128, 128, (B_, K, T)).astype(np.int8)

def kern(v_ref, r_ref, o_ref):
    vv = v_ref[:]
    tiled = jnp.broadcast_to(vv[:, :, None, :], (B_, K32, 8, M)).reshape(B_, K32, 8 * M)
    blk = jax.lax.broadcasted_iota(jnp.uint32, (B_, K32, 8 * M), 2) // jnp.uint32(M)
    dn = jnp.where(blk < 4, jnp.uint32(8) * (jnp.uint32(3) - jnp.minimum(blk, 3)), jnp.uint32(0))
    up = jnp.where(blk >= 4, jnp.uint32(8) * (blk - jnp.uint32(3)), jnp.uint32(0))
    w = jnp.where(blk < 4, tiled >> dn, tiled << up)
    w = jnp.where(blk >= 7, jnp.uint32(0), w)   # block 7 unused
    lhs = pltpu.bitcast(w, jnp.int8)
    o_ref[:] = jax.lax.dot_general(lhs, r_ref[:], (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)

got = np.asarray(pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((B_, 8 * M, T), jnp.int32))(
    jnp.asarray(v), jnp.asarray(r)))
def bytes_of(w):
    lb = ((w[:, :, None, :] >> (8*np.arange(4))[None,None,:,None]) & 0xFF
          ).astype(np.uint8).astype(np.int8)
    return lb.reshape(B_, K, M)
def shifted(x, d):
    return (x >> np.uint32(8*(3-d))) if d < 3 else x if d == 3 else (x << np.uint32(8*(d-3)))
want = np.concatenate([np.einsum('bkm,bkt->bmt',
    bytes_of(shifted(v, d)).astype(np.int32), r.astype(np.int32))
    for d in range(7)] + [np.zeros((B_, M, T), np.int32)], axis=1)
print("tiled-shift match:", np.array_equal(got, want))
