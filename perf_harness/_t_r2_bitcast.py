"""Probe pltpu.bitcast u32->i8 semantics + cost, and batched transposes.

Questions (run CPU-interpret first, then hardware):
 1. bitcast (R, 128) u32 -> (4R, 128) i8: byte order across sublanes?
 2. XOR 0x80808080 + bitcast == exact centered bytes (b_e - 128)?
 3. does a dot_general contracting the bitcast sublane axis lower on TPU?
 4. cost: XOR+bitcast+dot vs shift-extract+dot on s1-like shapes.
 5. cost: batched transpose (128, tb, kmid) -> (128, kmid, tb).

Run: JAX_PLATFORMS=cpu python perf_harness/_t_r2_bitcast.py interp
     python perf_harness/_t_r2_bitcast.py hw
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

MODE = sys.argv[1] if len(sys.argv) > 1 else "interp"
INTERP = MODE == "interp"

import jax

if INTERP:
    # the axon plugin ignores the JAX_PLATFORMS env var; force via config
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_order():
    """bitcast byte order: which sublane holds which byte."""
    R, C = 8, 128

    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    x = np.zeros((R, C), np.uint32)
    # row r, lane c: distinct bytes 4r+0..3 pattern: byte e value = e*16+r
    for r in range(R):
        x[r] = (0x30201000 + r * 0x01010101)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4 * R, C), jnp.int8),
        interpret=INTERP,
    )(jnp.asarray(x))
    out = np.asarray(out)
    print("bitcast rows 0..7 lane0:", out[:8, 0].tolist())
    # if little-endian consecutive: row 4r+e == e*16+r
    ok_le = all(out[4 * r + e, 0] == e * 16 + r for r in range(R) for e in range(4))
    # grouped order: row e*R + r
    ok_gr = all(out[e * R + r, 0] == e * 16 + r for r in range(R) for e in range(4))
    print(f"interleaved(4r+e): {ok_le}; grouped(e*R+r): {ok_gr}")
    return ok_le, ok_gr


def probe_xor_dot():
    """XOR-centered bytes + dot == exact signed contraction + constant."""
    R, C = 256, 128
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 32, (C, R), dtype=np.uint32)   # contraction on dim0
    w = rng.integers(-128, 128, (16, 4 * C), dtype=np.int8)  # rhs byte-planes

    def kern(x_ref, w_ref, o_ref):
        xb = pltpu.bitcast(x_ref[:] ^ np.uint32(0x80808080), jnp.int8)
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, R), jnp.int32),
        interpret=INTERP,
    )(jnp.asarray(x), jnp.asarray(w))
    out = np.asarray(out)
    # reference: value contribution per (j, e): s_e(x[j]) = byte_e(x[j]) - 128
    bytes_ = np.stack([((x >> (8 * e)) & 0xFF).astype(np.int32) - 128
                       for e in range(4)])                   # (4, C, R)
    # interleaved rows 4j+e
    lhs = bytes_.transpose(1, 0, 2).reshape(4 * C, R)        # (4C, R)
    want = w.astype(np.int32) @ lhs
    print("xor-dot exact:", np.array_equal(out, want))


def bench(fn, args, iters=20, name=""):
    o = fn(*args)
    jax.block_until_ready(o)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.time()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e6:.1f} us")
    return dt


def probe_costs():
    """Pallas kernels doing STEPS iterations of the core loop, to measure
    marginal cost of extraction variants and batched transposes."""
    R = 2048          # tb=64 * k1n2=32
    STEPS = 200
    rng = np.random.default_rng(1)
    xT = jnp.asarray(rng.integers(0, 1 << 32, (128, R), dtype=np.uint32))
    w = jnp.asarray(rng.integers(-128, 128, (7, 128, 512), dtype=np.int8))
    st3 = jnp.asarray(rng.integers(0, 1 << 30, (128, 64, 32), dtype=np.uint32))

    def k_bitcast(x_ref, w_ref, o_ref):
        def body(i, acc):
            xb = pltpu.bitcast(x_ref[:] ^ (np.uint32(0x80808080) + i.astype(jnp.uint32)), jnp.int8)
            ds = [jax.lax.dot_general(w_ref[d], xb, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
                  for d in range(7)]
            s = ds[0]
            for d in ds[1:]:
                s = s + d
            return acc + s.astype(jnp.uint32)
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((128, R), jnp.uint32))

    def k_shift(x_ref, w_ref, o_ref):
        def body(i, acc):
            xv = x_ref[:] + i.astype(jnp.uint32)
            limbs = [((xv >> np.uint32(7 * e)) & np.uint32(127))
                     .astype(jnp.int32).astype(jnp.int8) for e in range(5)]
            xb = jnp.concatenate(limbs, axis=0)          # (5*128, R)
            ds = [jax.lax.dot_general(w_ref[d][:, :512], jnp.pad(xb, ((0, 0), (0, 0)))[:512],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
                  for d in range(7)]
            s = ds[0]
            for d in ds[1:]:
                s = s + d
            return acc + s.astype(jnp.uint32)
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((128, R), jnp.uint32))

    def k_btrans(x_ref, o_ref):
        def body(i, acc):
            t = jnp.transpose(x_ref[:] + i.astype(jnp.uint32), (0, 2, 1))
            return acc + t
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((128, 32, 64), jnp.uint32))

    def k_noop(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[:] + i.astype(jnp.uint32)
        o_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                     jnp.zeros((128, 64, 32), jnp.uint32))

    f1 = pl.pallas_call(k_bitcast, out_shape=jax.ShapeDtypeStruct((128, R), jnp.uint32),
                        interpret=INTERP)
    f2 = pl.pallas_call(k_shift, out_shape=jax.ShapeDtypeStruct((128, R), jnp.uint32),
                        interpret=INTERP)
    f3 = pl.pallas_call(k_btrans, out_shape=jax.ShapeDtypeStruct((128, 32, 64), jnp.uint32),
                        interpret=INTERP)
    f4 = pl.pallas_call(k_noop, out_shape=jax.ShapeDtypeStruct((128, 64, 32), jnp.uint32),
                        interpret=INTERP)
    it = 1 if INTERP else 10
    bench(jax.jit(f1), (xT, w), it, f"xor+bitcast+7dot x{STEPS}")
    bench(jax.jit(f2), (xT, w), it, f"shift5+concat+7dot x{STEPS}")
    bench(jax.jit(f3), (st3,), it, f"batched transpose(128,64,32) x{STEPS}")
    bench(jax.jit(f4), (st3,), it, f"noop add x{STEPS}")


if __name__ == "__main__":
    print(f"mode={MODE} devices={jax.devices()}")
    probe_order()
    probe_xor_dot()
    if MODE == "hw":
        probe_costs()
