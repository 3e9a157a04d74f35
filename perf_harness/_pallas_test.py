import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_u32(a_ref, b_ref, o_ref):
    a = a_ref[:]; b = b_ref[:]
    o_ref[:] = a * b + (a >> jnp.uint32(3)) + (a & jnp.uint32(0xffff))

def k_u64(a_ref, b_ref, o_ref):
    a = a_ref[:]; b = b_ref[:]
    o_ref[:] = a * b + (a >> jnp.uint64(3))

a32 = jnp.arange(8*128, dtype=jnp.uint32).reshape(8,128)
b32 = (a32 * 7 + 3).astype(jnp.uint32)
try:
    r = pl.pallas_call(k_u32, out_shape=jax.ShapeDtypeStruct((8,128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a32, b32)
    expect = (np.arange(8*128, dtype=np.uint32).reshape(8,128))
    expect = expect * (expect*7+3) + (expect>>3) + (expect & 0xffff)
    print("u32 pallas:", "OK" if np.array_equal(np.asarray(r), expect) else "WRONG")
except Exception as e:
    print("u32 pallas FAIL:", str(e)[:200])

a64 = jnp.arange(8*128, dtype=jnp.uint64).reshape(8,128) + jnp.uint64(2**33)
b64 = a64 * jnp.uint64(3)
try:
    r = pl.pallas_call(k_u64, out_shape=jax.ShapeDtypeStruct((8,128), jnp.uint64),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a64, b64)
    a_n = np.arange(8*128, dtype=np.uint64).reshape(8,128) + 2**33
    expect = a_n * (a_n*3) + (a_n>>3)
    print("u64 pallas:", "OK" if np.array_equal(np.asarray(r), expect) else "WRONG")
except Exception as e:
    print("u64 pallas FAIL:", str(e)[:300])
