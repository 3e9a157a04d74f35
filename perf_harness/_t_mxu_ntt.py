"""MXU four-step NTT prototype (round-2 perf lever exploration).

Idea: the production blind-rotate kernel is VPU-bound on u32 multiply
lowering (~49G u32 mults/s measured).  The MXU does int8 x int8 -> int32
matmuls at hundreds of TOPS.  A length-2048 NTT factors as two small DFT
matmuls (four-step: 64x32), and a 30-bit modular matmul factors into 25
int8-limb matmuls (5 limbs of 7 bits per operand) + a cheap diagonal-sum
epilogue mod p.

This harness validates exactness of the limb-decomposed modular matmul and
the four-step NTT against tfhe_tpu.ops.ntt, then measures the raw int8
matmul throughput on the attached TPU at production-like shapes.

Run from the repo root:  python perf_harness/_t_mxu_ntt.py [tpu]
(default CPU = exactness only; 'tpu' adds throughput measurement).
"""

import sys
import time

import numpy as np

LIMB_BITS = 7
N_LIMBS = 5  # covers < 2^35 >= 2^30 operands


def limbs_int8(x: np.ndarray) -> np.ndarray:
    """(..., n) u32 -> (N_LIMBS, ..., n) int8 with 7-bit non-negative limbs."""
    out = np.empty((N_LIMBS,) + x.shape, dtype=np.int8)
    v = x.astype(np.uint64)
    for i in range(N_LIMBS):
        out[i] = ((v >> (LIMB_BITS * i)) & ((1 << LIMB_BITS) - 1)).astype(np.int8)
    return out


def modmul_matmul_np(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    """Exact (a @ b) mod p via int8 limb matmuls; numpy reference."""
    al = limbs_int8(a)  # (L, M, K)
    bl = limbs_int8(b)  # (L, K, N)
    m, k = a.shape
    n = b.shape[1]
    # diagonal sums over limb pairs: d = i + j in [0, 2L-2]
    diag = np.zeros((2 * N_LIMBS - 1, m, n), dtype=np.int64)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            prod = al[i].astype(np.int32) @ bl[j].astype(np.int32)
            diag[i + j] += prod
    acc = np.zeros((m, n), dtype=np.uint64)
    for d in range(2 * N_LIMBS - 1):
        w = pow(2, LIMB_BITS * d, p)
        acc = (acc + (diag[d] % p).astype(np.uint64) * np.uint64(w)) % np.uint64(p)
    return acc.astype(np.uint32)


def four_step_ntt_np(x: np.ndarray, p: int, w: int, psi: int,
                     n1: int = 64) -> np.ndarray:
    """Negacyclic forward NTT of length N via twist + four-step, output in
    (k2*n1 + k1) transposed order.  x: (batch, N) u32."""
    batch, n = x.shape
    n2 = n // n1
    # negacyclic twist: x[i] *= psi^i
    tw = np.array([pow(psi, i, p) for i in range(n)], dtype=np.uint64)
    xt = (x.astype(np.uint64) * tw) % p
    a = xt.reshape(batch, n1, n2).astype(np.uint32)
    # columns: B[k1, i2] = sum_i1 W1[k1, i1] A[i1, i2],  W1 = w^(N2*k1*i1)
    w1 = np.array([[pow(w, (n2 * k1 * i1) % n, p) for i1 in range(n1)]
                   for k1 in range(n1)], dtype=np.uint32)
    b = np.stack([modmul_matmul_np(w1, a[i], p) for i in range(batch)])
    # twiddles: B[k1, i2] *= w^(k1*i2)
    tw2 = np.array([[pow(w, k1 * i2, p) for i2 in range(n2)]
                    for k1 in range(n1)], dtype=np.uint64)
    b = ((b.astype(np.uint64) * tw2) % p).astype(np.uint32)
    # rows: C[k1, k2] = sum_i2 B[k1, i2] W2[i2, k2],  W2 = w^(N1*i2*k2)
    w2 = np.array([[pow(w, (n1 * i2 * k2) % n, p) for k2 in range(n2)]
                   for i2 in range(n2)], dtype=np.uint32)
    c = np.stack([modmul_matmul_np(b[i], w2, p) for i in range(batch)])
    # X[k2*n1 + k1] = C[k1, k2]
    return c.transpose(0, 2, 1).reshape(batch, n)


def check_exactness():
    sys.path.insert(0, ".")
    from tfhe_tpu.ops import ntt

    p = int(ntt.PRIMES[0])
    rng = np.random.default_rng(0)

    # 1. modular matmul vs bigint reference
    m, k, n = 64, 64, 32
    a = rng.integers(0, p, (m, k), dtype=np.uint32)
    b = rng.integers(0, p, (k, n), dtype=np.uint32)
    ref = (a.astype(object) @ b.astype(object)) % p
    got = modmul_matmul_np(a, b, p)
    assert (got == ref.astype(np.uint32)).all(), "modmul_matmul mismatch"
    print("modmul_matmul exact vs bigint reference")

    # 2. four-step NTT vs the production butterfly NTT (same prime/roots)
    size = 2048
    plan = ntt.make_plan(size, 4)
    # any primitive 2N-th root works: the evaluation set {psi^(2k+1)} is all
    # roots of X^N + 1 regardless of the psi chosen
    psi = None
    for g in range(2, 200):
        cand = pow(g, (p - 1) // (2 * size), p)
        if pow(cand, size, p) == p - 1:
            psi = cand
            break
    w = pow(psi, 2, p)
    x = rng.integers(0, p, (4, size), dtype=np.uint32)
    got = four_step_ntt_np(x, p, w, psi)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    ref_all = np.asarray(
        ntt.forward_all(jnp.asarray(x.astype(np.uint64))[:, None, :], plan, jnp))
    ref0 = ref_all[:, 0, 0, :]  # prime 0
    # the butterfly NTT outputs bit-reversed order; compare as multisets per
    # evaluation point: both are {P(psi^(2k+1))} — match via sorted values
    for i in range(4):
        assert sorted(got[i].tolist()) == sorted(ref0[i].tolist()), i
    print("four-step NTT evaluates the same point set as the butterfly NTT")

    # 3. pointwise-domain correctness: negacyclic product via four-step
    y = rng.integers(0, p, (4, size), dtype=np.uint32)
    ga, gb = four_step_ntt_np(x, p, w, psi), four_step_ntt_np(y, p, w, psi)
    prod_pw = (ga.astype(np.uint64) * gb) % p
    # reference product via ntt module (full negacyclic polymul mod prime 0)
    ref_poly = np.empty((4, size), dtype=np.uint32)
    for i in range(4):
        c = np.zeros(size, dtype=object)
        xa, yb = x[i].astype(object), y[i].astype(object)
        for s in range(size):
            c[s] = 0
        # O(N^2) too slow at 2048; use numpy convolve in object mode for 1 row
        if i == 0:
            full = np.convolve(xa, yb)
            lo, hi = full[:size], full[size:]
            c = (lo - np.concatenate([hi, [0]])) % p
            ref_poly[i] = c.astype(np.uint32)
    got_prod = four_step_intt_np(prod_pw, p, w, psi)
    assert (got_prod[0] == ref_poly[0]).all(), "negacyclic product mismatch"
    print("four-step fwd -> pointwise -> inv == negacyclic polymul")


def four_step_intt_np(xhat: np.ndarray, p: int, w: int, psi: int,
                      n1: int = 64) -> np.ndarray:
    """Inverse of four_step_ntt_np (including the transposed ordering)."""
    batch, n = xhat.shape
    n2 = n // n1
    winv = pow(w, p - 2, p)
    c = xhat.reshape(batch, n2, n1).transpose(0, 2, 1)  # C[k1, k2]
    w2i = np.array([[pow(winv, (n1 * i2 * k2) % n, p) for i2 in range(n2)]
                    for k2 in range(n2)], dtype=np.uint32)
    b = np.stack([modmul_matmul_np(c[i], w2i, p) for i in range(batch)])
    tw2i = np.array([[pow(winv, k1 * i2, p) for i2 in range(n2)]
                     for k1 in range(n1)], dtype=np.uint64)
    b = ((b.astype(np.uint64) * tw2i) % p).astype(np.uint32)
    w1i = np.array([[pow(winv, (n2 * k1 * i1) % n, p) for k1 in range(n1)]
                    for i1 in range(n1)], dtype=np.uint32)
    a = np.stack([modmul_matmul_np(w1i, b[i], p) for i in range(batch)])
    x = a.reshape(batch, n)
    ninv = pow(n, p - 2, p)
    psiinv = pow(psi, p - 2, p)
    twi = np.array([pow(psiinv, i, p) * ninv % p for i in range(n)],
                   dtype=np.uint64)
    return ((x.astype(np.uint64) * twi) % p).astype(np.uint32)


def measure_tpu():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    # production-like shape: batch 256 polys * k1=2 * 4 primes, N1=64 stage
    # -> M = 256*2*4*32 = 65536 rows of K=64, times N=64 matmul, 25 limb pairs
    M, K, N = 65536, 64, 64
    rng = np.random.default_rng(1)
    al = rng.integers(0, 128, (N_LIMBS, M, K), dtype=np.int8)
    bl = rng.integers(0, 128, (N_LIMBS, K, N), dtype=np.int8)

    @jax.jit
    def limb_matmuls(al, bl):
        outs = []
        for i in range(N_LIMBS):
            for j in range(N_LIMBS):
                outs.append(jnp.dot(al[i], bl[j],
                                    preferred_element_type=jnp.int32))
        return jnp.stack(outs).sum(axis=0)  # keep all work live

    alj = jax.device_put(al, dev)
    blj = jax.device_put(bl, dev)
    np.asarray(limb_matmuls(alj, blj))  # compile+run

    iters = 10
    t0 = time.time()
    for it in range(iters):
        # vary inputs: the axon runtime dedups identical executions
        r = limb_matmuls(alj if it % 2 == 0 else jnp.roll(alj, it, axis=1), blj)
    np.asarray(r)
    dt = time.time() - t0
    macs = 25 * M * K * N * iters
    print(f"int8 limb matmuls: {macs / dt / 1e12:.2f} T int8-MACs/s "
          f"({dt / iters * 1e3:.1f} ms/iter)")
    # one forward NTT (stage-1 equivalent) costs 25*M*K*N MACs at these
    # shapes; report the implied modmul rate
    print(f"implied 30-bit modmuls: {M * K * N * iters / dt / 1e9:.2f} G/s "
          f"(vs ~49 G u32-mults/s VPU baseline, 25 int8 MACs per modmul)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tpu":
        measure_tpu()
    else:
        check_exactness()
