import numpy as np, jax, jax.numpy as jnp, sys
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
case = sys.argv[1]
R = 8
x = jnp.arange(R*4096, dtype=jnp.uint32).reshape(R, 4096)
def k(x_ref, o_ref):
    if case == "slice": o_ref[:] = x_ref[:][:, :2048]
    elif case == "roll": o_ref[:] = pltpu.roll(x_ref[:], np.int32(5), axis=1)[:, :2048]
    elif case == "iota_div":
        j = jax.lax.broadcasted_iota(jnp.int32, (R, 2048), 1)
        o_ref[:] = x_ref[:][:, :2048] + ((j // np.int32(16)) % np.int32(2)).astype(jnp.uint32)
r = pl.pallas_call(k,
    out_shape=jax.ShapeDtypeStruct((R, 2048), jnp.uint32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
print(case, "result ok:", np.asarray(r).shape)
