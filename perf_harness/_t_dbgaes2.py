import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from tfhe_tpu import shortint
from tfhe_tpu.apps.aes import FheAes128, SBOX
from tfhe_tpu.integer.server_key import ServerKey as IntegerServerKey
from tfhe_tpu.integer.client_key import ClientKey as IntegerClientKey
from tfhe_tpu.shortint.wopbs import TEST_WOPBS_PARAM, WopbsKey
from tfhe_tpu.core.encrypt import decrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext

np.seterr(over="ignore")
ck = IntegerClientKey(shortint.TEST_PARAM_MESSAGE_2_CARRY_2, seed=0xAE5)
sk = IntegerServerKey(ck, seed=0xAE6)
wk = WopbsKey(ck.key, sk.key, TEST_WOPBS_PARAM, seed=0xAE7)
aes = FheAes128.__new__(FheAes128)
aes.sk, aes.wk = sk, wk
p = ck.params

enc = [ck.encrypt_radix(b, 4) for b in [0x53, 0x7C]]
outs = aes._sbox_bytes(enc)
# measure phase error of each VP block
for byte_i, (o, val) in enumerate(zip(outs, [SBOX[0x53], SBOX[0x7C]])):
    for blk_i, blk in enumerate(o.blocks):
        expect = ((val >> (2 * blk_i)) & 3) * p.delta
        pt = decrypt_lwe(ck.key.encryption_key, LweCiphertext(np.asarray(blk.data), 64))
        err = (int(pt) - expect) % (1 << 64)
        if err >= 1 << 63: err -= 1 << 64
        print(f"byte{byte_i} blk{blk_i}: |noise| = 2^{abs(err).bit_length()} (delta=2^59, xor-pack margin needs < 2^56)")
# and a fresh PBS output for comparison
fresh = sk.key.apply_lookup_table(ck.key.encrypt(2), sk.key.generate_lookup_table(lambda x: x))
pt = decrypt_lwe(ck.key.encryption_key, LweCiphertext(np.asarray(fresh.data), 64))
err = (int(pt) - 2 * p.delta) % (1 << 64)
if err >= 1 << 63: err -= 1 << 64
print(f"fresh PBS: |noise| = 2^{abs(err).bit_length()}")
