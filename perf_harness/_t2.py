import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def mk(axis_case):
    def k(s_ref, x_ref, o_ref):
        a = s_ref[0]
        if axis_case == "2d":
            o_ref[:] = pltpu.roll(x_ref[:], a, axis=1)[:, :2048]
        elif axis_case == "1d":
            o_ref[:] = pltpu.roll(x_ref[0], a, axis=0)[None, :2048]
        elif axis_case == "static":
            o_ref[:] = pltpu.roll(x_ref[:], np.int32(5), axis=1)[:, :2048]
    return k

x = jnp.arange(2*4096, dtype=jnp.uint32).reshape(2, 4096)
s = jnp.array([3], dtype=jnp.int32)
for case in ["static", "2d", "1d"]:
    try:
        r = pl.pallas_call(mk(case),
            grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((2,4096), lambda i,*_: (0,0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((2,2048), lambda i,*_: (0,0), memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((2,2048), jnp.uint32))(s, x)
        want = np.roll(np.asarray(x), 3 if case != "static" else 5, axis=1)[:, :2048]
        print(case, "OK", np.array_equal(np.asarray(r), want))
    except Exception as e:
        print(case, "FAIL:", str(e)[:150].replace("\n"," "))
