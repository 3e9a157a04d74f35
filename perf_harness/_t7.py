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
    if case == "use_scalar":
        o_ref[:] = x_ref[:] + a.astype(jnp.uint32)
    elif case == "ignore_scalar":
        o_ref[:] = x_ref[:] * jnp.uint32(2)
    elif case == "dynroll_use":
        o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)
r = pl.pallas_call(k,
    grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((R,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((R,4096), jnp.uint32))(s, x)
print(case, "ok", np.asarray(r)[0,:3])
