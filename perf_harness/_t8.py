import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
R = 8
x = jnp.arange(R*4096, dtype=jnp.uint32).reshape(R, 4096)
s = jnp.arange(1, dtype=jnp.int32) + 3  # (1,)
def k(s_ref, x_ref, o_ref):
    a = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)
r = pl.pallas_call(k,
    grid=(1,),
    in_specs=[pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
              pl.BlockSpec((R,4096), lambda i: (0,0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((R,4096), lambda i: (0,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R,4096), jnp.uint32))(s, x)
print("smem-input dynroll ok:", np.array_equal(np.asarray(r), np.roll(np.asarray(x), 3, axis=1)))
