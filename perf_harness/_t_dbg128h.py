import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu.ops import ntt, server128

np.seterr(over="ignore")
M = 1 << 128
N = 64
plan = ntt.make_plan(N, 6)
rng = np.random.default_rng(5)
BL, LEV, K1 = 24, 3, 2

# random full-range u128 GLWE and GGSW
def rnd_pair(shape):
    lo = rng.integers(0, 1<<64, shape, dtype=np.uint64)
    hi = rng.integers(0, 1<<64, shape, dtype=np.uint64)
    return lo, hi

g_lo, g_hi = rnd_pair((1, K1, N))
k_lo, k_hi = rnd_pair((LEV, K1, K1, N))
km = ntt.to_mont_all(ntt.forward_all_u128(k_lo, k_hi, plan, np), plan, np).astype(np.uint32)

got_lo, got_hi = server128.external_product128(jnp.asarray(g_lo), jnp.asarray(g_hi), jnp.asarray(km), plan, BL, LEV)
got = np.asarray(got_lo)[0].astype(object) + (np.asarray(got_hi)[0].astype(object) << 64)

# python model: decompose each poly coefficient, negacyclic conv, sum
def decomp_model(v):
    rep = BL * LEV
    res = v >> (128 - rep - 1)
    rb = res & 1
    res = (res + 1) >> 1
    res &= (1 << rep) - 1
    if res > (1 << (rep-1)) or (res == (1 << (rep-1)) and rb):
        res -= 1 << rep
    digits = []
    state = res
    for _ in range(LEV):
        d = state & ((1 << BL) - 1)
        state >>= BL  # python arithmetic shift
        if d > (1 << (BL-1)) or (d == (1 << (BL-1)) and state & 1):
            # carry rule: mirror bit-trick ((d-1)|state)&d >> BL-1
            pass
        carry = (((d - 1) | state) & d) >> (BL - 1) & 1
        state += carry
        digits.append(d - (carry << BL))
    return digits  # level LEV first

gi = [[int(g_lo[0,r,j]) | (int(g_hi[0,r,j])<<64) for j in range(N)] for r in range(K1)]
ki = [[[ [int(k_lo[l,r,c,j]) | (int(k_hi[l,r,c,j])<<64) for j in range(N)] for c in range(K1)] for r in range(K1)] for l in range(LEV)]
exp = [[0]*N for _ in range(K1)]
for r in range(K1):
    digs = [decomp_model(v) for v in gi[r]]  # per coeff: list of LEV digits
    for lev in range(LEV):
        dpoly = [digs[j][lev] for j in range(N)]
        for c in range(K1):
            # negacyclic conv dpoly * ki[lev][r][c]
            for a in range(N):
                if dpoly[a] == 0: continue
                for b in range(N):
                    t = dpoly[a] * ki[lev][r][c][b]
                    k2 = a + b
                    if k2 >= N:
                        exp[c][k2-N] = (exp[c][k2-N] - t) % M
                    else:
                        exp[c][k2] = (exp[c][k2] + t) % M
ok = all(int(got[c*N//N] if False else got.reshape(K1,N)[c][j]) == exp[c][j] for c in range(K1) for j in range(N)) if got.shape==(K1,N) else None
got2 = got.reshape(K1, N) if got.shape != (K1, N) else got
mism = [(c,j) for c in range(K1) for j in range(N) if int(got2[c][j]) % M != exp[c][j]]
print("EP vs python model mismatches:", len(mism), mism[:5])
if mism:
    c, j = mism[0]
    print("got", hex(int(got2[c][j]) % M), "exp", hex(exp[c][j]))
