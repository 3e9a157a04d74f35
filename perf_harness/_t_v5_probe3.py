"""Isolate the 224-lane failure: concat vs bitcast; and ladder rolls HW-vs-interpret."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_, K32, M, T = 8, 64, 32, 64
K = 4 * K32
v = np.random.randint(0, 2**32, (B_, K32, M), dtype=np.uint64).astype(np.uint32)
r = np.random.randint(-128, 128, (B_, K, T)).astype(np.int8)

def shifted(x, d, xp):
    return (x >> xp.uint32(8*(3-d))) if d < 3 else x if d == 3 else (x << xp.uint32(8*(d-3)))

# A1: per-diag bitcast (32 lanes, known-good) then i8 lane-concat, one dot
def kernA1(v_ref, r_ref, o_ref):
    vv = v_ref[:]
    lhs = jnp.concatenate([pltpu.bitcast(shifted(vv, d, jnp), jnp.int8)
                           for d in range(7)], axis=2)
    o_ref[:] = jax.lax.dot_general(lhs, r_ref[:], (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
got = np.asarray(pl.pallas_call(
    kernA1, out_shape=jax.ShapeDtypeStruct((B_, 7*M, T), jnp.int32))(
    jnp.asarray(v), jnp.asarray(r)))
def bytes_of(w):
    lb = ((w[:, :, None, :] >> (8*np.arange(4))[None,None,:,None]) & 0xFF
          ).astype(np.uint8).astype(np.int8)
    return lb.reshape(B_, K, M)
want = np.concatenate([np.einsum('bkm,bkt->bmt',
    bytes_of(shifted(v, d, np)).astype(np.int32), r.astype(np.int32))
    for d in range(7)], axis=1)
print("A1 match:", np.array_equal(got, want))

# A2: u32 lane-concat identity (no bitcast) — is the concat itself sound?
def kernA2(v_ref, o_ref):
    vv = v_ref[:]
    o_ref[:] = jnp.concatenate([shifted(vv, d, jnp) for d in range(7)], axis=2)
gotA2 = np.asarray(pl.pallas_call(
    kernA2, out_shape=jax.ShapeDtypeStruct((B_, K32, 7*M), jnp.uint32))(
    jnp.asarray(v)))
wantA2 = np.concatenate([shifted(v, d, np) for d in range(7)], axis=2)
print("A2 match:", np.array_equal(gotA2, wantA2))

# C: ladder rolls, hardware vs interpret (amounts constant along rolled axes)
k1, n2, tb, LANES = 2, 16, 8, 128
x = np.random.randint(0, 2**32, (k1, n2, tb, LANES), dtype=np.uint64).astype(np.uint32)
a2 = np.tile(np.random.randint(0, n2, (1, 1, tb, 1)), (k1, n2, 1, 1)).astype(np.int32)
qm = np.random.randint(0, LANES, (k1, n2, tb, 1)).astype(np.int32)  # varies over i2, const over lanes
def kernC(x_ref, a_ref, q_ref, o_ref):
    y = x_ref[:]
    a2v, qmv = a_ref[:], q_ref[:]
    for b in range(4):
        rr = pltpu.roll(y, np.int32(1 << b), 1)
        y = jnp.where((a2v >> b) & 1 == 1, rr, y)
    for b in range(7):
        rr = pltpu.roll(y, np.int32(1 << b), 3)
        y = jnp.where((qmv >> b) & 1 == 1, rr, y)
    o_ref[:] = y
args = (jnp.asarray(x), jnp.asarray(a2), jnp.asarray(qm))
oshape = jax.ShapeDtypeStruct(x.shape, jnp.uint32)
gotHW = np.asarray(pl.pallas_call(kernC, out_shape=oshape)(*args))
gotIN = np.asarray(pl.pallas_call(kernC, out_shape=oshape, interpret=True)(*args))
print("C hw==interpret:", np.array_equal(gotHW, gotIN))
