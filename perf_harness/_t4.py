import numpy as np, jax, jax.numpy as jnp, sys
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

case = sys.argv[1]
x = jnp.arange(2*4096, dtype=jnp.uint32).reshape(2, 4096)
s = jnp.array([3], dtype=jnp.int32)

def k(s_ref, x_ref, o_ref):
    a = s_ref[0]
    if case == "roll_only":
        o_ref[:] = pltpu.roll(x_ref[:], np.int32(5), axis=1)
    elif case == "slice_only":
        o_ref[:] = x_ref[:][:, :2048]
    elif case == "dynroll_only":
        o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)
    elif case == "dynroll_i32":
        o_ref[:] = pltpu.roll(x_ref[:], a.astype(jnp.int32), axis=1)

oshape = (2, 4096) if case != "slice_only" else (2, 2048)
r = pl.pallas_call(k,
    grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((2,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(oshape, lambda i,*_: (0,0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct(oshape, jnp.uint32))(s, x)
shift = 5 if "dyn" not in case else 3
want = np.roll(np.asarray(x), shift, axis=1) if case != "slice_only" else np.asarray(x)[:, :2048]
print(case, "OK", np.array_equal(np.asarray(r), want))
