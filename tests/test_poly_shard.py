"""Intra-op poly-axis sharding (SURVEY §2.13 P5): the distributed four-step
NTT (all_to_all transpose) and the poly-sharded blind rotate must be
bit-identical to the single-device exact paths, on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfhe_tpu.ops import ntt, server as srv
from tfhe_tpu.parallel import poly_shard
from tfhe_tpu.parallel.mesh import make_mesh

N = 512


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8], axis_name="poly")


def test_sharded_polymul_matches(mesh):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 64, (3, N), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, 1 << 64, (3, N), dtype=np.uint64))
    plan = ntt.make_plan(N, 4)
    want = np.asarray(ntt.negacyclic_polymul_u64(a, b, plan, jnp))
    got = np.asarray(poly_shard.sharded_negacyclic_polymul(mesh, a, b, 4))
    assert np.array_equal(got, want)


def test_sharded_blind_rotate_matches(mesh):
    """Poly-sharded BSK blind rotate == ops.server.blind_rotate, with real
    key material at small parameters."""
    from tfhe_tpu.core import keygen as kg
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.utils.csprng import (
        DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator,
        TUniform)

    n_in, k_glwe, bl, lev = 4, 1, 23, 1
    gen_s = SecretRandomGenerator(123)
    lwe_sk = kg.generate_binary_lwe_secret_key(n_in, gen_s)
    glwe_sk = kg.generate_binary_glwe_secret_key(k_glwe, N, gen_s)
    gen_e = EncryptionRandomGenerator(7, DeterministicSeeder(99))
    bsk = kg.generate_lwe_bootstrap_key(
        lwe_sk, glwe_sk, DecompParams(bl, lev), TUniform(3), gen_e)
    bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)

    rng = np.random.default_rng(5)
    b = 3
    mask = rng.integers(0, 2 * N, (b, n_in), dtype=np.uint64)
    body = rng.integers(0, 2 * N, (b,), dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, (b, k_glwe + 1, N), dtype=np.uint64)
    want = np.asarray(srv.blind_rotate(
        jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        jnp.asarray(bsk_mont).astype(jnp.uint64), plan, bl, lev))

    bsk_sh = poly_shard.prepare_bsk_poly_sharded(
        mesh, jnp.asarray(np.asarray(bsk.data)), 4)
    got = np.asarray(poly_shard.sharded_blind_rotate_poly(
        mesh, jnp.asarray(mask), jnp.asarray(body), jnp.asarray(lut),
        bsk_sh, bl, lev, 4))
    assert np.array_equal(got, want)


def test_latency_mesh_full_ap_fheuint_add():
    """VERDICT r2 task 4: small-batch integer ops route ONE PBS across the
    whole mesh.  FheUint8 add through the poly-sharded atomic pattern on
    the 8-device mesh decrypts correctly."""
    import numpy as np

    from tfhe_tpu import integer, shortint
    from tfhe_tpu.parallel import poly_shard as ps
    from tfhe_tpu.parallel.mesh import make_mesh

    ck, sk = integer.gen_keys(shortint.TEST_PARAM_MESSAGE_2_CARRY_2,
                              seed=0x9E5)
    mesh = make_mesh(axis_name="poly")
    ps.set_latency_mesh(mesh, threshold=16)
    try:
        a = ck.encrypt_radix(173, 4)
        b = ck.encrypt_radix(62, 4)
        out = sk.add_parallelized(a, b)
        assert ck.decrypt_radix(out) == (173 + 62) % 256
    finally:
        ps.set_latency_mesh(None)
