"""Mosaic feature probes for the round-2 MXU kernel design.

Answers (pass/fail + exactness) on the real TPU:
  1. cast:    int32 -> int8 cast inside a kernel, fed to jnp.dot (relimbing)
  2. batched: jax.lax.dot_general with a batch dim on int8 operands
  3. roll:    pltpu.roll with a *traced* (dynamic) shift, lane + sublane axes
  4. gather:  per-row take_along_axis inside a kernel (rotation fallback)

Run from repo root: python perf_harness/_t_r2_probe.py
"""

import functools
import sys

import numpy as np


def probe(name):
    def deco(fn):
        @functools.wraps(fn)
        def run():
            try:
                fn()
                print(f"PROBE {name}: OK")
            except Exception as e:  # noqa
                msg = str(e).split("\n")[0][:160]
                print(f"PROBE {name}: FAIL — {msg}")
        return run
    return deco


@probe("cast_i32_to_i8_then_dot")
def p_cast():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]                       # int32 (128, 128)
        lo = (x & 127).astype(jnp.int8)      # relimb: low 7 bits
        o_ref[...] = jnp.dot(lo, w_ref[...], preferred_element_type=jnp.int32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**20, (128, 128), dtype=np.int32)
    w = rng.integers(0, 127, (128, 128), dtype=np.int8)
    got = np.asarray(jax.jit(f)(x, w))
    ref = (x & 127).astype(np.int64) @ w.astype(np.int64)
    assert (got == ref).all(), "cast+dot mismatch"


@probe("batched_dot_general_i8")
def p_batched():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    B, M, K, NN = 8, 32, 64, 32
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M, NN), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(1)
    a = rng.integers(-64, 64, (B, M, K), dtype=np.int8)
    b = rng.integers(0, 127, (B, K, NN), dtype=np.int8)
    got = np.asarray(jax.jit(f)(a, b))
    ref = np.einsum("bmk,bkn->bmn", a.astype(np.int64), b.astype(np.int64))
    assert (got == ref).all(), "batched dot mismatch"


@probe("dynamic_roll_lanes")
def p_roll_lanes():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
    s = np.array([5], dtype=np.int32)
    got = np.asarray(jax.jit(f)(s, x))
    assert (got == np.roll(x, 5, axis=1)).all(), "lane roll mismatch"


@probe("dynamic_roll_sublanes")
def p_roll_sub():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 0)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = np.arange(16 * 128, dtype=np.int32).reshape(16, 128)
    s = np.array([3], dtype=np.int32)
    got = np.asarray(jax.jit(f)(s, x))
    assert (got == np.roll(x, 3, axis=0)).all(), "sublane roll mismatch"


@probe("u64pair_negacyclic_roll_vec")
def p_vec_roll():
    # vectorized-across-batch negacyclic rotation via one-hot sum of static
    # rolls (chunk level) — the rotation scheme candidate, exactness only
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, L, B = 16, 128, 8  # N = C*L = 2048

    def kernel(a_ref, x_ref, o_ref):
        # x: (B, C, L) u32; a: (B,) chunk-level shift in [0, 2C)
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        cid = jax.lax.broadcasted_iota(jnp.int32, (1, C, 1), 1)
        for r in range(2 * C):
            rolled = pltpu.roll(x, r, 1)     # static sublane roll
            # negacyclic sign: chunks wrapped past the end get negated
            wrapped = (cid < (r % C)) ^ (r >= C)
            sign = jnp.where(wrapped, jnp.uint32(0) - jnp.uint32(1),
                             jnp.uint32(1))
            sel = (a_ref[...][:, None, None] == r)
            acc = acc + jnp.where(sel, rolled * sign, jnp.uint32(0))
        o_ref[...] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**32, (B, C, L), dtype=np.uint32)
    a = rng.integers(0, 2 * C, (B,), dtype=np.int32)
    got = np.asarray(jax.jit(f)(a, x))
    for b in range(B):
        flat = x[b].reshape(-1)
        sh = int(a[b]) * L
        full = np.concatenate([flat, (0 - flat)])
        ref = np.roll(full, sh)[: C * L].reshape(C, L)
        # np.roll moves right; negacyclic mul by X^sh: coeff j <- -/+ coeff j-sh
        assert (got[b] == ref).all(), f"vec roll mismatch b={b} sh={sh}"


if __name__ == "__main__":
    p_cast()
    p_batched()
    p_roll_lanes()
    p_roll_sub()
    p_vec_roll()
