"""End-to-end core-crypto slice: keygen -> encrypt -> KS -> MS -> blind rotate
-> sample extract -> decrypt, mirroring apps/test-vectors/src/main.rs flow
with its toy parameters (noiseless, exact).  All server compute goes through
the single jitted ks_pbs_batch pipeline."""

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.encrypt import decode, decrypt_lwe, encode, encrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.core.params import TEST_VECTOR_TOY_PARAMS as TOY
from tfhe_tpu.ops import server
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator

RAND_SEED = 0x74666865
MSG_BITS = 4
DELTA = 1 << (64 - MSG_BITS - 1)


def _keyset():
    p = TOY
    sec = SecretRandomGenerator(RAND_SEED)
    glwe_sk = kg.generate_binary_glwe_secret_key(p.glwe_dimension, p.polynomial_size, sec)
    large_sk = glwe_sk.as_lwe_secret_key()
    small_sk = kg.generate_binary_lwe_secret_key(p.lwe_dimension, sec)
    enc = EncryptionRandomGenerator(RAND_SEED, DeterministicSeeder(RAND_SEED))
    ksk = kg.generate_lwe_keyswitch_key(large_sk, small_sk, p.ks_decomp, p.lwe.noise, enc)
    bsk = kg.generate_lwe_bootstrap_key(small_sk, glwe_sk, p.pbs_decomp, p.glwe.noise, enc)
    bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)
    return p, large_sk, small_sk, enc, jnp.asarray(ksk.data), jnp.asarray(bsk_mont), plan


def test_encrypt_decrypt_roundtrip_and_linear_ops():
    p = TOY
    sec = SecretRandomGenerator(RAND_SEED)
    glwe_sk = kg.generate_binary_glwe_secret_key(p.glwe_dimension, p.polynomial_size, sec)
    large_sk = glwe_sk.as_lwe_secret_key()
    enc = EncryptionRandomGenerator(RAND_SEED, DeterministicSeeder(RAND_SEED))
    a = encrypt_lwe(large_sk, encode(4, MSG_BITS), p.glwe.noise, enc)
    b = encrypt_lwe(large_sk, encode(3, MSG_BITS), p.glwe.noise, enc)
    assert decode(decrypt_lwe(large_sk, a), MSG_BITS) == 4
    assert decode(decrypt_lwe(large_sk, b), MSG_BITS) == 3
    s = LweCiphertext(a.data + b.data)
    assert decode(decrypt_lwe(large_sk, s), MSG_BITS) == 7
    m = LweCiphertext(a.data * np.uint64(3))
    assert decode(decrypt_lwe(large_sk, m), MSG_BITS) == 12


def test_keyswitch():
    p, large_sk, small_sk, enc, ksk, bsk_mont, plan = _keyset()
    a = encrypt_lwe(large_sk, encode(4, MSG_BITS), p.glwe.noise, enc)
    ks = server.keyswitch(jnp.asarray(a.data)[None], ksk,
                          p.ks_decomp.base_log, p.ks_decomp.level_count)
    ks_np = np.asarray(ks)[0]
    assert decode(decrypt_lwe(small_sk, LweCiphertext(ks_np)), MSG_BITS) == 4


def test_full_ks_pbs_pipeline():
    """Batched KS->MS->BR->SE over several messages and two LUTs."""
    p, large_sk, small_sk, enc, ksk, bsk_mont, plan = _keyset()
    msgs = [0, 1, 4, 5, 7, 11, 15]
    cts = [encrypt_lwe(large_sk, encode(m, MSG_BITS), p.glwe.noise, enc) for m in msgs]
    batch = jnp.asarray(np.stack([c.data for c in cts]))

    for f in [lambda x: x, lambda x: (2 * x) % 16, lambda x: (x * 3 + 1) % 16]:
        lut = server.generate_lut(p.polynomial_size, p.glwe_dimension + 1,
                                  1 << MSG_BITS, DELTA, f)
        lut_b = jnp.broadcast_to(jnp.asarray(lut)[None], (len(msgs),) + lut.shape)
        out = server.ks_pbs_batch(batch, lut_b, ksk, bsk_mont, plan,
                                  p.ks_decomp.base_log, p.ks_decomp.level_count,
                                  p.pbs_decomp.base_log, p.pbs_decomp.level_count)
        out_np = np.asarray(out)
        for i, m in enumerate(msgs):
            res = decode(decrypt_lwe(large_sk, LweCiphertext(out_np[i])), MSG_BITS)
            assert res == f(m) % 16, (m, res, f(m) % 16)


def test_glwe_keyswitch():
    """GLWE -> GLWE keyswitch between two keys
    (algorithms/glwe_keyswitch.rs analog)."""
    import jax.numpy as jnp

    from tfhe_tpu.core import keygen as kg
    from tfhe_tpu.core.encrypt import decrypt_glwe, encrypt_glwe_assign
    from tfhe_tpu.core.entities import GlweCiphertext
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.ops import server as srv
    from tfhe_tpu.utils.csprng import (DeterministicSeeder,
                                       EncryptionRandomGenerator,
                                       SecretRandomGenerator, TUniform)

    n_poly, k_in, k_out = 256, 2, 1
    sec = SecretRandomGenerator(5)
    sk_in = kg.generate_binary_glwe_secret_key(k_in, n_poly, sec)
    sk_out = kg.generate_binary_glwe_secret_key(k_out, n_poly, sec)
    gen = EncryptionRandomGenerator(6, DeterministicSeeder(7))
    noise = TUniform(3)
    gksk, plan = kg.generate_glwe_keyswitch_key(
        sk_in, sk_out, DecompParams(8, 4), noise, gen)
    # encrypt a message polynomial under sk_in
    delta = 1 << 59
    msg = np.arange(n_poly, dtype=np.uint64) % 16
    with np.errstate(over="ignore"):
        body = msg * np.uint64(delta)
        ct = encrypt_glwe_assign(sk_in, body, noise, gen)
        out = np.asarray(srv.glwe_keyswitch(
            jnp.asarray(ct.data)[None], jnp.asarray(gksk), plan, 8, 4))[0]
        dec = decrypt_glwe(sk_out, GlweCiphertext(out, 64))
    got = ((dec.astype(np.uint64) + np.uint64(delta // 2)) // np.uint64(delta)) % 32 % 16
    assert np.array_equal(got, msg)


def test_chunked_bsk_generation_matches_monolithic():
    """entities/lwe_bootstrap_key_chunk.rs analog: chunks assembled in any
    split are bit-identical to the monolithic key (fork-tree determinism)."""
    from tfhe_tpu.core import keygen as kg
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.utils.csprng import (DeterministicSeeder,
                                       EncryptionRandomGenerator,
                                       SecretRandomGenerator, TUniform)

    sec = SecretRandomGenerator(21)
    in_sk = kg.generate_binary_lwe_secret_key(12, sec)
    glwe_sk = kg.generate_binary_glwe_secret_key(1, 64, sec)
    decomp = DecompParams(8, 2)

    def fresh_gen():
        return EncryptionRandomGenerator(77, DeterministicSeeder(78))

    full = kg.generate_lwe_bootstrap_key(in_sk, glwe_sk, decomp, TUniform(7),
                                         fresh_gen())
    import numpy as np

    # two different chunkings, each from a fresh same-seeded generator
    c1 = kg.generate_lwe_bootstrap_key_chunk(in_sk, glwe_sk, decomp,
                                             TUniform(7), fresh_gen(), 0, 5)
    c2 = kg.generate_lwe_bootstrap_key_chunk(in_sk, glwe_sk, decomp,
                                             TUniform(7), fresh_gen(), 5, 7)
    assert np.array_equal(np.concatenate([c1, c2]), full.data)
    c3 = kg.generate_lwe_bootstrap_key_chunk(in_sk, glwe_sk, decomp,
                                             TUniform(7), fresh_gen(), 3, 4)
    assert np.array_equal(c3, full.data[3:7])


def test_mxu_keyswitch_matmul_matches_u64():
    """The int8-limb MXU keyswitch contraction vs the exact u64 dot."""
    import numpy as np
    import jax.numpy as jnp
    from tfhe_tpu.ops import server as srv

    rng = np.random.default_rng(9)
    b_sz, kdim, m = 4, 96, 17
    base_log = 4
    bound = 1 << (base_log - 1)
    digits = rng.integers(-bound, bound + 1, (b_sz, kdim)).astype(np.int64)
    d_u64 = digits.astype(np.uint64)
    k = rng.integers(0, 1 << 64, (kdim, m), dtype=np.uint64)
    want = np.asarray(srv._matmul_u64(jnp.asarray(d_u64), jnp.asarray(k)))
    got = np.asarray(srv._matmul_digits_u64_mxu(
        jnp.asarray(d_u64), jnp.asarray(k), bound))
    assert (got == want).all()
