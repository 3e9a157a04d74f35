"""Round-2 microbenchmarks: MXU int8 sustained rate in Pallas + VPU op costs.

Methodology (hard-won on this machine):
  - inputs are device_put BEFORE timing (host->device rides a slow tunnel);
  - several pre-staged input sets are cycled (runtime dedups identical
    executions);
  - each variant is timed at two iteration counts and the MARGINAL rate is
    reported (cancels dispatch/fetch overhead AND in-kernel loop overhead
    is visible by comparing to the absolute rate);
  - sync via np.asarray (block_until_ready lies through the tunnel).

Run from repo root: python perf_harness/_t_r2_micro.py [mxu|vpu|all]
"""

import sys
import time

import numpy as np

NSETS = 3


def _time_min(fn, arg_sets, reps=3):
    """Min single-call latency over reps (each call a distinct input set)."""
    best = float("inf")
    for c in range(reps):
        t0 = time.time()
        r = fn(*arg_sets[c % NSETS])
        np.asarray(r)
        best = min(best, time.time() - t0)
    return best


def _bench2(make_fn, arg_sets, iters_lo, iters_hi, work_per_iter, unit, label,
            calls=3):
    import jax
    f_lo, f_hi = make_fn(iters_lo), make_fn(iters_hi)
    np.asarray(f_lo(*arg_sets[0]))  # compile
    np.asarray(f_hi(*arg_sets[0]))
    t_lo = _time_min(f_lo, arg_sets, calls)
    t_hi = _time_min(f_hi, arg_sets, calls)
    marginal = (t_hi - t_lo) / (iters_hi - iters_lo)
    rate = work_per_iter / marginal if marginal > 0 else float("inf")
    print(f"{label}: {rate / 1e12:.3f} T{unit}/s marginal "
          f"({marginal*1e6:.3f} us/iter; lo {t_lo*1e3:.1f} / hi {t_hi*1e3:.1f} ms)",
          flush=True)
    return rate


def bench_mxu():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    for (nd, M, K, NN, il, ih) in [
        (16, 128, 128, 512, 3000, 15000),
        (16, 128, 128, 2048, 800, 4000),
        (8, 128, 256, 512, 3000, 15000),
        (4, 128, 512, 512, 3000, 15000),
        (16, 256, 128, 512, 1500, 7500),
        (1, 128, 128, 512, 20000, 100000),
        # batched dot_general middle-matmul candidates:
        #   N1=128 layout: 128 groups of (128, 128) @ (128, 32)
        #   N1=64  layout:  64 groups of (128, 256) @ (256, 64)
        ("bat", 128, 32, 32, 3000, 15000),
        ("bat2", 128, 128, 32, 600, 3000),
        ("bat3", 64, 256, 64, 600, 3000),
        ("s64", 64, 64, 4096, 600, 3000),
    ]:
        if nd in ("bat", "bat2", "bat3"):
            G, rows = (128, 64) if nd == "bat" else ((128, 128) if nd == "bat2" else (64, 128))

            def make(iters, G=G, rows=rows, K=K, NN=NN):
                def kernel(w_ref, x_ref, o_ref):
                    def body(i, acc):
                        x = x_ref[i % 2]
                        s = jax.lax.dot_general(
                            x, w_ref[...],
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)
                        return acc + s
                    o_ref[...] = jax.lax.fori_loop(
                        0, iters, body, jnp.zeros((G, rows, NN), jnp.int32))
                return jax.jit(pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((G, rows, NN), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ))

            sets = []
            for s in range(NSETS):
                w = rng.integers(0, 127, (G, K, NN), dtype=np.int8)
                x = rng.integers(0, 127, (2, G, rows, K), dtype=np.int8)
                sets.append((jax.device_put(w), jax.device_put(x)))
            work = G * rows * K * NN
            _bench2(make, sets, il, ih, work, " int8-MACs",
                    f"mxu batched G={G} {rows}x{K}x{NN}")
            continue

        if nd == "s64":
            def make(iters, K=K, NN=NN):
                def kernel(w_ref, x_ref, o_ref):
                    def body(i, acc):
                        x = x_ref[i % 2]
                        s = acc
                        for d in range(16):
                            s = s + jnp.dot(w_ref[d], x,
                                            preferred_element_type=jnp.int32)
                        return s
                    o_ref[...] = jax.lax.fori_loop(
                        0, iters, body, jnp.zeros((64, NN), jnp.int32))
                return jax.jit(pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((64, NN), jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ))
            sets = []
            for s in range(NSETS):
                w = rng.integers(0, 127, (16, 64, K), dtype=np.int8)
                x = rng.integers(0, 127, (2, K, NN), dtype=np.int8)
                sets.append((jax.device_put(w), jax.device_put(x)))
            _bench2(make, sets, il, ih, 16 * 64 * K * NN, " int8-MACs",
                    f"mxu s64 64x{K}x{NN}")
            continue

        def make(iters, nd=nd, M=M, K=K, NN=NN):
            def kernel(w_ref, x_ref, o_ref):
                def body(i, acc):
                    x = x_ref[i % 2]
                    s = acc
                    for d in range(nd):
                        s = s + jnp.dot(w_ref[d], x,
                                        preferred_element_type=jnp.int32)
                    return s
                o_ref[...] = jax.lax.fori_loop(
                    0, iters, body, jnp.zeros((M, NN), jnp.int32))
            return jax.jit(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, NN), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ))

        import jax
        sets = []
        for s in range(NSETS):
            w = rng.integers(0, 127, (nd, M, K), dtype=np.int8)
            x = rng.integers(0, 127, (2, K, NN), dtype=np.int8)
            sets.append((jax.device_put(w), jax.device_put(x)))
        work = nd * M * K * NN
        _bench2(make, sets, il, ih, work, " int8-MACs",
                f"mxu nd={nd} {M}x{K}x{NN}")


def bench_vpu():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SHAPE = (256, 1024)
    rng = np.random.default_rng(1)
    lanes = SHAPE[0] * SHAPE[1]

    def make_factory(opname):
        def make(iters):
            def kernel(a_ref, b_ref, o_ref):
                def body(i, y):
                    a = a_ref[...]
                    b = b_ref[...] + i.astype(jnp.uint32)
                    if opname == "mul":
                        return y * b + a
                    if opname == "add":
                        return (y + b) ^ a
                    if opname == "shift":
                        return ((y >> jnp.uint32(7)) + b) ^ a
                    if opname == "select":
                        return jnp.where(y >= b, y - b, y + a)
                    if opname == "mulwide":
                        # full 32x32->64 (lo,hi) via 16-bit split, then mix
                        a0 = y & jnp.uint32(0xFFFF)
                        a1 = y >> jnp.uint32(16)
                        b0 = b & jnp.uint32(0xFFFF)
                        b1 = b >> jnp.uint32(16)
                        p00 = a0 * b0
                        mid = a0 * b1 + a1 * b0
                        lo = p00 + (mid << jnp.uint32(16))
                        hi = a1 * b1 + (mid >> jnp.uint32(16))
                        return lo ^ hi
                    raise ValueError(opname)
                if opname == "f32mul":
                    def body(i, y):  # noqa: F811
                        return y * (b_ref[...].astype(jnp.float32)) + i.astype(jnp.float32)
                    init = jnp.ones(SHAPE, jnp.float32)
                else:
                    init = jnp.ones(SHAPE, jnp.uint32)
                o_ref[...] = jax.lax.fori_loop(0, iters, body, init)

            dt = jnp.float32 if opname == "f32mul" else jnp.uint32
            return jax.jit(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(SHAPE, dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ))
        return make

    for opname, ops in [("mul", 1), ("add", 1), ("shift", 1), ("select", 1),
                        ("mulwide", 1), ("f32mul", 1)]:
        sets = []
        for s in range(NSETS):
            a = rng.integers(0, 2**31, SHAPE, dtype=np.uint32)
            b = rng.integers(0, 2**31, SHAPE, dtype=np.uint32)
            sets.append((jax.device_put(a), jax.device_put(b)))
        # report the rate of the WHOLE chain per iter (lanes * 1 "op-unit")
        _bench2(make_factory(opname), sets, 500, 2500, lanes * ops,
                f" {opname}-chain", f"vpu {opname}")




def bench_vpu_ilp():
    """Throughput with 4 independent chains (the serial bench measures
    latency; epilogue code has abundant cross-element ILP)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SHAPE = (256, 1024)
    rng = np.random.default_rng(2)
    lanes = SHAPE[0] * SHAPE[1]

    def make(iters):
        def kernel(a_ref, b_ref, o_ref):
            def body(i, ys):
                y0, y1, y2, y3 = ys
                a = a_ref[...]
                b = b_ref[...] + i.astype(jnp.uint32)
                return (y0 * b + a, y1 * a + b, (y2 + b) * a, y3 * (a ^ b) + b)
            init = tuple(jnp.full(SHAPE, np.uint32(k + 1), jnp.uint32)
                         for k in range(4))
            r = jax.lax.fori_loop(0, iters, body, init)
            o_ref[...] = r[0] ^ r[1] ^ r[2] ^ r[3]
        return jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    sets = []
    for s in range(NSETS):
        a = rng.integers(0, 2**31, SHAPE, dtype=np.uint32)
        b = rng.integers(0, 2**31, SHAPE, dtype=np.uint32)
        sets.append((jax.device_put(a), jax.device_put(b)))
    # 4 chains x ~2 ops each = 8 op-units per lane-iter
    _bench2(make, sets, 2000, 10000, lanes * 8, " ops(ILP)", "vpu ilp4 mul+add")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("mxu", "all"):
        bench_mxu()
    if which in ("vpu", "all"):
        bench_vpu()
    if which in ("ilp", "all"):
        bench_vpu_ilp()
