import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from tfhe_tpu import shortint
from tfhe_tpu.core.encrypt import decrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.ops import server

np.seterr(over="ignore")
ck = shortint.ClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0x128)
sk = shortint.ServerKey(ck, seed=0x128)
p = sk.params
msg = 2
ct = ck.encrypt(msg)
ks = server.keyswitch(jnp.asarray(np.asarray(ct.data))[None], sk.ksk, p.ks_base_log, p.ks_level, 64)
ksn = np.asarray(ks)[0]
N = 512
log_mod = 10
body = int(server.modulus_switch(jnp.asarray(ksn[-1:]), log_mod, 64)[0])
mask = np.asarray(server.modulus_switch(jnp.asarray(ksn[:-1]), log_mod, 64))
s = [int(b) for b in ck.lwe_secret_key.data]
rot = (sum(int(a)*si for a, si in zip(mask, s)) - body) % (2*N)
# value under the redundant LUT: coefficient 0 of lut * X^rot
# lut boxes: after the half-box roll, coefficient j holds f((j + half)/box)... easier: model
box = N // 16
# model exactly like generate_lut128 + negacyclic rotation
M = 1 << 128
delta = (1 << 128) // 32
acc = []
for i in range(16):
    acc += [i * delta] * box
half = box // 2
for j in range(half):
    acc[j] = (-acc[j]) % M
acc = acc[half:] + acc[:half]
# coefficient 0 of acc * X^(-rot_inv)? blind rotate result = lut * X^{rot} where rot = sum - b... careful:
# acc0 = lut / X^b; each step multiplies by X^{a_i s_i} -> total lut * X^{sum a_i s_i - b} = lut * X^{rot}
# coefficient 0 of lut*X^rot = sign * lut[(0 - rot) mod N ...]
r = rot % N
cyc = rot // N
j = (0 - rot) % N          # source index
# (lut * X^rot)[0] = lut[N - rot] * (-1)^(...) for rot>0
sign = 1
k = j + rot  # = 0 mod N... derive: out[(j+rot) mod'] rule
# directly: out[t] = sum over j: j+rot = t + m*N -> out[0]: j = (-rot) mod N, sign = (-1)^((j+rot)/N)
sign = -1 if ((j + rot)//N) % 2 == 1 else 1
val = (sign * acc[j]) % M
decoded = ((val + delta//2) // delta) % 32 % 16
print("model rot:", rot, "-> decoded box:", decoded)
pt = decrypt_lwe(ck.lwe_secret_key, LweCiphertext(ksn, 64))
print("exact KS pt top5:", ((pt % (1<<64)) + (1<<58)) >> 59, "(expect", msg, "* 2 in 32-space)")
