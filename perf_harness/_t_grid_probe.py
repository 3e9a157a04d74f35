import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref, acc):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] += x_ref[:]
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]

n_steps = 16
x = jnp.arange(n_steps * 8 * 128, dtype=jnp.uint32).reshape(n_steps, 8, 128)
f = pl.pallas_call(
    kernel,
    grid=(n_steps,),
    in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.uint32),
    scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.uint32)],
)
out = jax.jit(f)(x)
ref = np.asarray(x).sum(axis=0, dtype=np.uint32)[None]
print("grid probe ok:", np.array_equal(np.asarray(out), ref))
