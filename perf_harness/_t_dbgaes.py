import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from tfhe_tpu import shortint
from tfhe_tpu.apps.aes import (FheAes128, SBOX, key_expansion, _shift_rows_idx,
                               _mix_single_column, _gf_mul)
from tfhe_tpu.integer.server_key import ServerKey as IntegerServerKey
from tfhe_tpu.integer.client_key import ClientKey as IntegerClientKey
from tfhe_tpu.shortint.wopbs import TEST_WOPBS_PARAM, WopbsKey

np.seterr(over="ignore")
ck = IntegerClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xAE5)
sk = IntegerServerKey(ck, seed=0xAE6)
wk = WopbsKey(ck.key, sk.key, TEST_WOPBS_PARAM, seed=0xAE7)
aes = FheAes128.__new__(FheAes128)
aes.sk, aes.wk = sk, wk

key = bytes(range(16))
block = bytes.fromhex("00112233445566778899aabbccddeeff")
rks = key_expansion(key)
aes.round_keys = [[ck.encrypt_radix(b, 4) for b in rk] for rk in rks[:2]]

def dec(s):
    return [ck.decrypt_radix(b) for b in s]

# stage 0: ARK0
s_f = [aes._xor_scalar(aes.round_keys[0][i], block[i]) for i in range(16)]
s_m = [b ^ k for b, k in zip(block, rks[0])]
print("ARK0 ok:", dec(s_f) == list(s_m))
# stage 1: sbox
s_f = aes._sbox_bytes(s_f)
s_m = [SBOX[b] for b in s_m]
print("sbox ok:", dec(s_f) == s_m)
# stage 2: shiftrows
sr = _shift_rows_idx()
s_f = [s_f[sr[i]] for i in range(16)]
s_m = [s_m[sr[i]] for i in range(16)]
print("sr ok:", dec(s_f) == s_m)
# stage 3: mixcolumns
mul2_t, mul3_t = aes._xtimes_tables()
gg = aes._bytes_ggsws(s_f)
m2 = aes._bytes_lut_from_ggsws(gg, mul2_t)
m3 = aes._bytes_lut_from_ggsws(gg, mul3_t)
print("mul2 ok:", dec(m2) == [_gf_mul(x, 2) for x in s_m])
print("mul3 ok:", dec(m3) == [_gf_mul(x, 3) for x in s_m])
out = []
for c in range(4):
    a = s_f[4*c:4*c+4]; a2 = m2[4*c:4*c+4]; a3 = m3[4*c:4*c+4]
    out += [
        aes._xor(aes._xor(a2[0], a3[1]), aes._xor(a[2], a[3])),
        aes._xor(aes._xor(a[0], a2[1]), aes._xor(a3[2], a[3])),
        aes._xor(aes._xor(a[0], a[1]), aes._xor(a2[2], a3[3])),
        aes._xor(aes._xor(a3[0], a[1]), aes._xor(a[2], a2[3])),
    ]
s_m = sum((_mix_single_column(s_m[4*c:4*c+4]) for c in range(4)), [])
print("mix ok:", dec(out) == s_m)
# stage 4: ARK1
s_f = [aes._xor(out[i], aes.round_keys[1][i]) for i in range(16)]
s_m = [b ^ k for b, k in zip(s_m, rks[1])]
print("ark1 ok:", dec(s_f) == list(s_m))
