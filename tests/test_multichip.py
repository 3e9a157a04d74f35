"""Multi-chip correctness on the 8-virtual-device CPU mesh: REAL keys,
encrypt -> sharded KS+PBS -> decrypt (parallel/mesh.py, SURVEY §2.13 P4).

Unlike __graft_entry__.dryrun_multichip (shape/path agreement on random
keys), these tests check actual decryption through the sharded pipelines,
including the production Pallas kernel via the interpreter under shard_map.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfhe_tpu import shortint
from tfhe_tpu.parallel import mesh as pmesh
from tfhe_tpu.shortint.client_key import ClientKey
from tfhe_tpu.shortint.server_key import ServerKey

PARAMS = shortint.TEST_PARAM_MESSAGE_2_CARRY_2


@pytest.fixture(scope="module")
def keys():
    ck = ClientKey(PARAMS, seed=0x31337)
    sk = ServerKey(ck, seed=0x31337)
    return ck, sk


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return pmesh.make_mesh(jax.devices()[:8])


def _dec(ck, data):
    from tfhe_tpu.shortint.ciphertext import NOMINAL_NOISE, Ciphertext
    p = PARAMS
    ct = Ciphertext(data, degree=p.total_modulus - 1, noise_level=NOMINAL_NOISE,
                    message_modulus=p.message_modulus,
                    carry_modulus=p.carry_modulus)
    return ck.decrypt_raw(ct)


def _batch(ck, sk, vals, f):
    p = PARAMS
    cts = np.stack([np.asarray(ck.encrypt(v).data) for v in vals])
    lut = sk.generate_lookup_table(f)
    lut_b = np.broadcast_to(lut.acc, (len(vals),) + lut.acc.shape)
    return jnp.asarray(cts), jnp.asarray(lut_b)


def test_sharded_ks_pbs_decrypts(keys, mesh):
    ck, sk = keys
    p = PARAMS
    vals = [i % 4 for i in range(16)]
    f = lambda x: (3 * x + 1) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs(
        mesh, cts, lut_b, sk.ksk, sk.bsk_mont, sk.plan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)


def test_sharded_shard_map_decrypts(keys, mesh):
    ck, sk = keys
    p = PARAMS
    vals = [(i * 3) % 4 for i in range(16)]
    f = lambda x: (x * x) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs_shard_map(
        mesh, cts, lut_b, sk.ksk, sk.bsk_mont, sk.plan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)


def test_sharded_shard_map_pallas_interpret_decrypts(keys, mesh):
    """The production Pallas kernel under shard_map (interpret mode)."""
    ck, sk = keys
    p = PARAMS
    # per-device shard (64/8 = 8) must be a multiple of the kernel batch tile
    vals = [i % 4 for i in range(64)]
    f = lambda x: (2 * x) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs_shard_map(
        mesh, cts, lut_b, sk.ksk, sk.bsk_mont, sk.plan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
        use_pallas=True, pallas_interpret=True)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)


def test_sharded_mxu_kernel_decrypts(keys, mesh):
    """The MXU-stack production path (ks_pbs_batch_mxu, fused v3 kernel in
    interpret mode) under shard_map across the 8-device mesh."""
    from tfhe_tpu.ops import mxu

    ck, sk = keys
    p = PARAMS
    mplan = mxu.make_mxu_plan(p.polynomial_size, num_primes=4)
    m, _ = mxu.bsk_to_mxu(sk._bsk_coeff, mplan)
    vals = [(i + 1) % 4 for i in range(16)]
    f = lambda x: (x * 5 + 2) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs_mxu(
        mesh, cts, lut_b, sk.ksk, jnp.asarray(m), mplan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
        tb=2, interpret=True)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)


def test_sharded_mxu_v5_kernel_decrypts(keys, mesh):
    """The v5 byte-limb production path (packed-u32 middle words + corr)
    under shard_map across the 8-device mesh, interpret mode."""
    from tfhe_tpu.ops import mxu

    ck, sk = keys
    p = PARAMS
    mplan = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=15)
    v32, corr, _ = mxu.bsk_to_mxu_v5(sk._bsk_coeff, mplan)
    vals = [(3 * i + 2) % 4 for i in range(16)]
    f = lambda x: (x * 7 + 1) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs_mxu(
        mesh, cts, lut_b, sk.ksk, jnp.asarray(v32), mplan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
        tb=2, kernel="v5", corr_mid=jnp.asarray(corr), interpret=True)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)


def test_sharded_mxu_v7_kernel_decrypts(keys, mesh):
    """The v7 (jfold + truncated-accumulator) production default under
    shard_map across the 8-device mesh, interpret mode."""
    from tfhe_tpu.ops import mxu

    ck, sk = keys
    p = PARAMS
    mplan = mxu.make_mxu_plan(p.polynomial_size, num_primes=3, round_bits=15)
    v32, corr, _ = mxu.bsk_to_mxu_v5(sk._bsk_coeff, mplan)
    vals = [(2 * i + 1) % 4 for i in range(16)]
    f = lambda x: (x * 3 + 2) % 16
    cts, lut_b = _batch(ck, sk, vals, f)
    out = pmesh.sharded_ks_pbs_mxu(
        mesh, cts, lut_b, sk.ksk, jnp.asarray(v32), mplan,
        p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
        tb=2, kernel="v7", corr_mid=jnp.asarray(corr), interpret=True)
    out = np.asarray(out)
    for i, v in enumerate(vals):
        got = _dec(ck, out[i])
        assert got == f(v), (i, v, got)
