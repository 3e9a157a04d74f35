import numpy as np, jax, jax.numpy as jnp, sys
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
case = sys.argv[1]
R = 8
x = jnp.arange(R*4096, dtype=jnp.uint32).reshape(R, 4096)
s = jnp.arange(1, dtype=jnp.int32) + 3
def k(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)
if case == "nogrid":
    r = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R,4096), jnp.uint32))(s, x)
elif case == "grid2":
    # grid over batch tiles, 2 tiles
    x2 = jnp.concatenate([x, x+1], axis=0)  # (16, 4096)
    r2 = pl.pallas_call(k,
        grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((R,4096), lambda i: (i,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R,4096), lambda i: (i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2*R,4096), jnp.uint32))(s, x2)
    r = r2[:R]
print(case, "ok:", np.array_equal(np.asarray(r), np.roll(np.asarray(x), 3, axis=1)))
