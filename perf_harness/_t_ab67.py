import functools, sys, time
sys.path.insert(0, ".")
import numpy as np, jax
from tfhe_tpu.ops import mxu, pallas_mxu
from tfhe_tpu.shortint import V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 as P
from tfhe_tpu.utils.keycache import get_shortint_keys

tb, b = 256, 512
n_poly, n_in, k = P.polynomial_size, P.lwe_dimension, P.glwe_dimension
_, sk = get_shortint_keys(P)
plan = mxu.make_mxu_plan(n_poly, num_primes=3, round_bits=15)
bhat, _ = mxu.bsk_eval_domain(sk._bsk_coeff, plan)
v32, corr = mxu.middle_v5_from_eval_device(jax.device_put(bhat), plan)
np.asarray(v32[0, 0, 0, 0, 0])
rng = np.random.default_rng(3)


def inputs(bb, trunc):
    mask = rng.integers(0, 2 * n_poly, (bb, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * n_poly, (bb,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 63, (bb, k + 1, n_poly), dtype=np.uint64)
    if trunc:
        lut &= np.uint64(0xFFFFFFFF00000000)
    return jax.device_put(mask), jax.device_put(body), jax.device_put(lut)


for name, trunc in (("v6", False), ("v7", True), ("v6b", False),
                    ("v7b", True)):
    run = jax.jit(functools.partial(
        pallas_mxu.blind_rotate_pallas_v5, plan=plan,
        base_log=P.pbs_base_log, levels=P.pbs_level, tb=tb, ablate=None,
        jfold=True, trunc_acc=trunc))
    sets = [inputs(b, trunc) for _ in range(3)]
    t0 = time.time()
    np.asarray(run(*sets[0], v32=v32, corr_mid=corr))
    print(f"# {name} compile+first {time.time()-t0:.1f}s", flush=True)
    iters = 6
    t0 = time.time()
    for i in range(iters):
        out = run(*sets[i % 3], v32=v32, corr_mid=corr)
    np.asarray(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms/512 -> {512 / dt * 1e3:.1f} BR/s", flush=True)
