"""FheUint64 add latency breakdown (VERDICT r4 next-#4).

Times one add end-to-end at production 2_2, then instruments:
  - per _apply round: host-side wall between entry and return
  - raw batched KS+PBS kernel time at B=32 (the floor for one round)
  - Python/ciphertext-wrapping overhead = e2e - sum(round walls)
Env: PIPE=v3|v9 kernel family via params choice; ITERS."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import tfhe_tpu as t
from tfhe_tpu import shortint
from tfhe_tpu.utils.keycache import get_shortint_keys

P = shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
ck, sk = get_shortint_keys(P)
from tfhe_tpu.integer.server_key import ServerKey as IntSk
from tfhe_tpu.integer.client_key import ClientKey as IntCk
ick = IntCk.__new__(IntCk); ick.key = ck; ick.params = P
# wrap the KEYCACHED shortint server key (IntSk(ck) would re-run keygen)
isk = IntSk.__new__(IntSk)
isk.key = sk
isk.params = sk.params
isk.msg = sk.params.message_modulus
isk._luts = {}
NB = 32

def enc(v):
    from tfhe_tpu.integer.ciphertext import RadixCiphertext
    blocks = []
    x = v
    for _ in range(NB):
        blocks.append(ck.encrypt(x % 4)); x //= 4
    return RadixCiphertext(blocks)

a = enc(123456789012345); b = enc(987654321098765)

# warm/compile
t0 = time.time()
out = isk.add_parallelized(a, b)
_ = [np.asarray(bl.data) for bl in out.blocks]
print(f"compile+first add: {time.time()-t0:.1f}s", flush=True)

# instrument rounds
orig = sk.apply_lookup_table_batch
rounds = []
def timed(blocks, luts, *a_, **k_):
    t0 = time.time()
    r = orig(blocks, luts, *a_, **k_)
    rounds.append((len(blocks) if isinstance(blocks, list) else -1,
                   time.time() - t0))
    return r
sk.apply_lookup_table_batch = timed

ITERS = int(os.environ.get("ITERS", "4"))
vals = [(123456789 + i, 55555555 + 7 * i) for i in range(ITERS)]
cts = [(enc(x), enc(y)) for x, y in vals]
t0 = time.time()
for (x, y), (ca, cb) in zip(vals, cts):
    rounds.clear()
    t1 = time.time()
    out = isk.add_parallelized(ca, cb)
    _ = [np.asarray(bl.data) for bl in out.blocks]
    e2e = time.time() - t1
    rtot = sum(d for _, d in rounds)
    print(f"add e2e {e2e*1e3:.1f} ms | rounds {len(rounds)} "
          f"sum {rtot*1e3:.1f} ms | sizes {[n for n, _ in rounds]} | "
          f"per-round {[round(d*1e3,1) for _, d in rounds]}", flush=True)
    # verify
    got = 0
    for i, bl in enumerate(reversed(out.blocks)):
        got = got * 4 + ck.decrypt_raw(bl)
    assert got == (x + y) % (1 << 64), (got, x + y)
dt = (time.time() - t0) / ITERS
print(f"mean e2e: {dt*1e3:.1f} ms", flush=True)
sk.apply_lookup_table_batch = orig

# raw kernel floor at B=32 (one round of 32 blocks, device-side timing)
from tfhe_tpu.ops import server as srv
lut = sk.generate_lookup_table(lambda x: x % 4)
cts32 = [[ck.encrypt(i % 4) for i in range(32)] for _ in range(3)]
t0 = time.time()
o = sk.apply_lookup_table_batch(cts32[0], lut)
np.asarray(o[0].data)
print(f"B=32 round compile/warm: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for i in range(4):
    o = sk.apply_lookup_table_batch(cts32[i % 3], lut)
np.asarray(o[-1].data)
print(f"B=32 round steady: {(time.time()-t0)/4*1e3:.1f} ms", flush=True)
