"""Multi-bit PBS tests (toy noiseless params; exact results)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.core import keygen as kg, multibit as mb
from tfhe_tpu.core.encrypt import decode, decrypt_lwe, encode, encrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.core.params import DecompParams, GlweParams, LweParams, BootstrapParams
from tfhe_tpu.ops import server
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, Gaussian, SecretRandomGenerator

MSG_BITS = 4

PARAMS = BootstrapParams(
    lwe=LweParams(6, Gaussian(0.0)),
    glwe=GlweParams(1, 256, Gaussian(0.0)),
    pbs_decomp=DecompParams(24, 1),
    ks_decomp=DecompParams(37, 1),
)


@pytest.mark.parametrize("grouping", [2, 3])
def test_multibit_pbs(grouping):
    p = PARAMS
    sec = SecretRandomGenerator(0x3B)
    glwe_sk = kg.generate_binary_glwe_secret_key(p.glwe_dimension, p.polynomial_size, sec)
    large_sk = glwe_sk.as_lwe_secret_key()
    small_sk = kg.generate_binary_lwe_secret_key(p.lwe_dimension, sec)
    enc = EncryptionRandomGenerator(0x3B, DeterministicSeeder(0x3B))
    ksk = kg.generate_lwe_keyswitch_key(large_sk, small_sk, p.ks_decomp, p.lwe.noise, enc)
    mbsk = mb.generate_multibit_bootstrap_key(small_sk, glwe_sk, p.pbs_decomp,
                                              grouping, p.glwe.noise, enc)
    mbsk_mont, plan = mb.multibit_bsk_to_ntt(mbsk)

    msgs = [0, 3, 7, 12, 15]
    cts = [encrypt_lwe(large_sk, encode(m, MSG_BITS), p.glwe.noise, enc) for m in msgs]
    batch = jnp.asarray(np.stack([c.data for c in cts]))
    ks = server.keyswitch(batch, jnp.asarray(ksk.data),
                          p.ks_decomp.base_log, p.ks_decomp.level_count)
    log_mod = p.polynomial_size.bit_length()
    msed = server.modulus_switch(ks, log_mod)
    degrees = server.multibit_switched_degrees(ks[:, :-1], grouping, log_mod,
                                               raw=True)
    delta = 1 << (64 - MSG_BITS - 1)
    f = lambda x: (x * 5 + 3) % 16
    lut = server.generate_lut(p.polynomial_size, 2, 16, delta, f)
    lut_b = jnp.broadcast_to(jnp.asarray(lut)[None], (len(msgs), 2, p.polynomial_size))
    acc = server.blind_rotate_multibit(degrees, msed[:, -1], lut_b,
                                       jnp.asarray(mbsk_mont), plan,
                                       p.pbs_decomp.base_log,
                                       p.pbs_decomp.level_count, grouping)
    out = np.asarray(server.sample_extract(acc))
    for m, row in zip(msgs, out):
        got = decode(decrypt_lwe(large_sk, LweCiphertext(row)), MSG_BITS)
        assert got == f(m), (m, got, f(m))
