import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(s_ref, x_ref, o_ref):
    a = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], np.int32(5), axis=1)[:, :2048]

x = jnp.arange(2*4096, dtype=jnp.uint32).reshape(2, 4096)
s = jnp.array([3], dtype=jnp.int32)
r = pl.pallas_call(k,
    grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((2,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2,2048), lambda i,*_: (0,0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((2,2048), jnp.uint32))(s, x)
