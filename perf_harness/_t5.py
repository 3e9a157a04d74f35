import numpy as np, jax, jax.numpy as jnp, sys
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
case = sys.argv[1]
R = 8
x = jnp.arange(R*4096, dtype=jnp.uint32).reshape(R, 4096)
s = jnp.array([3], dtype=jnp.int32)
def k(s_ref, x_ref, o_ref):
    a = s_ref[0]
    if case == "roll_static": o_ref[:] = pltpu.roll(x_ref[:], np.int32(5), axis=1)
    elif case == "slice": o_ref[:] = x_ref[:][:, :2048]
    elif case == "dynroll": o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)
    elif case == "dynroll_slice": o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)[:, :2048]
oshape = (R, 4096) if case in ("roll_static","dynroll") else (R, 2048)
r = pl.pallas_call(k,
    grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((R,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(oshape, lambda i,*_: (0,0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct(oshape, jnp.uint32))(s, x)
shift = 5 if case=="roll_static" else 3
want = np.roll(np.asarray(x), shift, axis=1)
if "slice" in case: want = want[:, :2048] if case=="dynroll_slice" else np.asarray(x)[:, :2048]
print(case, "OK", np.array_equal(np.asarray(r), want))
