"""Probe hardware semantics of the three v5 optimizations in isolation:
A) lane-concat of shifted u32 + bitcast -> i8 + (1,1)-contraction dot (224 lanes)
B) i8 table reshape (7,128,K)->(896,K) + dot
C) binary-ladder conditional rolls vs one-per-option ladder
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- A: stacked-mid emulation (small shapes: n1=8, kmid=64u32, cmid=32, tb=64)
B_, K32, M, T = 8, 64, 32, 64
K = 4 * K32
def kernA(v_ref, r_ref, o_ref):
    v = v_ref[:]
    w_all = jnp.concatenate(
        [v >> jnp.uint32(8 * (3 - d)) if d < 3 else v if d == 3
         else v << jnp.uint32(8 * (d - 3)) for d in range(7)], axis=2)
    lhs = pltpu.bitcast(w_all, jnp.int8)
    o_ref[:] = jax.lax.dot_general(lhs, r_ref[:], (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
v = np.random.randint(0, 2**32, (B_, K32, M), dtype=np.uint64).astype(np.uint32)
r = np.random.randint(-128, 128, (B_, K, T)).astype(np.int8)
got = np.asarray(pl.pallas_call(
    kernA, out_shape=jax.ShapeDtypeStruct((B_, 7 * M, T), jnp.int32))(
    jnp.asarray(v), jnp.asarray(r)))
def bytes_of(w):
    lb = ((w[:, :, None, :] >> (8 * np.arange(4))[None, None, :, None]) & 0xFF
          ).astype(np.uint8).astype(np.int8)
    return lb.reshape(B_, K, M)
want = np.concatenate([np.einsum(
    'bkm,bkt->bmt',
    bytes_of((v >> np.uint32(8*(3-d))) if d < 3 else v if d == 3
             else (v << np.uint32(8*(d-3)))).astype(np.int32),
    r.astype(np.int32)) for d in range(7)], axis=1)
print("A match:", np.array_equal(got, want))

# ---- B: i8 reshape (7,128,K2)->(896,K2) + dot
K2, NN = 256, 128
tab = np.random.randint(-128, 128, (7, 128, K2)).astype(np.int8)
rv = np.random.randint(-128, 128, (K2, NN)).astype(np.int8)
def kernB(t_ref, r_ref, o_ref):
    lhs = t_ref[:].reshape(7 * 128, K2)
    o_ref[:] = jax.lax.dot_general(lhs, r_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
gotB = np.asarray(pl.pallas_call(
    kernB, out_shape=jax.ShapeDtypeStruct((896, NN), jnp.int32))(
    jnp.asarray(tab), jnp.asarray(rv)))
wantB = tab.reshape(896, K2).astype(np.int32) @ rv.astype(np.int32)
print("B match:", np.array_equal(gotB, wantB))

# ---- C: binary-ladder rolls
k1, n2, tb, LANES = 2, 16, 8, 128
x = np.random.randint(0, 2**32, (k1, n2, tb, LANES), dtype=np.uint64).astype(np.uint32)
a2 = np.random.randint(0, n2, (k1, n2, tb, 1)).astype(np.int32)
qm = np.random.randint(0, LANES, (k1, n2, tb, 1)).astype(np.int32)
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
gotC = np.asarray(pl.pallas_call(
    kernC, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32))(
    jnp.asarray(x), jnp.asarray(a2), jnp.asarray(qm)))
wantC = np.empty_like(x)
for i1 in range(k1):
    for i2 in range(n2):
        for it in range(tb):
            s2, sl = int(a2[i1, i2, it, 0]), int(qm[i1, i2, it, 0])
            row = x[i1, (i2 - s2) % n2, it]   # roll along axis 1 by s2
            wantC[i1, i2, it] = np.roll(row, sl)
print("C match (per-row-amount NOT expected to match ref-of-rolled-self):",
      np.array_equal(gotC, wantC))
