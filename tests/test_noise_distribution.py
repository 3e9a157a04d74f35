"""Statistical noise-distribution checks against the closed-form formulas
(model: shortint/server_key/tests/noise_distribution/ mean_and_variance_check).

Fast insecure parameters, a few hundred samples; tolerances sized for the
sample count (relative sd of a variance estimate at n=256 is ~9%)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfhe_tpu.core import noise as nf
from tfhe_tpu.core import keygen as kg
from tfhe_tpu.core.encrypt import encrypt_lwe
from tfhe_tpu.core.params import BootstrapParams, DecompParams, GlweParams, LweParams
from tfhe_tpu.ops import server
from tfhe_tpu.utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform

PARAMS = BootstrapParams(
    lwe=LweParams(32, TUniform(7)),
    glwe=GlweParams(1, 512, TUniform(4)),
    pbs_decomp=DecompParams(20, 1),
    ks_decomp=DecompParams(4, 4),
)
NSAMPLES = 256
MSG_BITS = 4


def _signed(x):
    return np.asarray(x).astype(np.int64).astype(np.float64)


@pytest.fixture(scope="module")
def material():
    sec = SecretRandomGenerator(0x1234)
    glwe_sk = kg.generate_binary_glwe_secret_key(PARAMS.glwe_dimension, PARAMS.polynomial_size, sec)
    big_sk = glwe_sk.as_lwe_secret_key()
    small_sk = kg.generate_binary_lwe_secret_key(PARAMS.lwe_dimension, sec)
    enc = EncryptionRandomGenerator(0x9999, DeterministicSeeder(0x9999))
    cts = [encrypt_lwe(big_sk, 0, PARAMS.glwe.noise, enc) for _ in range(NSAMPLES)]
    ksk = kg.generate_lwe_keyswitch_key(big_sk, small_sk, PARAMS.ks_decomp,
                                        PARAMS.lwe.noise, enc)
    return glwe_sk, big_sk, small_sk, cts, ksk


def test_fresh_encryption_variance(material):
    glwe_sk, big_sk, small_sk, cts, ksk = material
    phases = np.array([_phase(big_sk, c.data) for c in cts])
    want = nf.distribution_variance(PARAMS.glwe.noise, 64)
    got = phases.var()
    assert abs(phases.mean()) < 5 * np.sqrt(want / NSAMPLES)
    assert 0.6 * want < got < 1.6 * want


def _phase(sk, data):
    dot = np.sum(np.asarray(data)[:-1] * sk.data, dtype=np.uint64)
    return float(np.int64(np.asarray(data)[-1] - dot))


def test_keyswitch_noise_matches_formula(material):
    glwe_sk, big_sk, small_sk, cts, ksk = material
    batch = jnp.asarray(np.stack([c.data for c in cts]))
    ks = np.asarray(server.keyswitch(batch, jnp.asarray(ksk.data),
                                     PARAMS.ks_decomp.base_log,
                                     PARAMS.ks_decomp.level_count))
    phases = np.array([_phase(small_sk, ks[i]) for i in range(NSAMPLES)])
    var_in = nf.distribution_variance(PARAMS.glwe.noise, 64)
    want = var_in + nf.keyswitch_additive_variance(
        PARAMS.big_lwe_dimension, PARAMS.ks_decomp.base_log,
        PARAMS.ks_decomp.level_count,
        nf.distribution_variance(PARAMS.lwe.noise, 64))
    got = phases.var()
    assert 0.5 * want < got < 2.0 * want, (got, want)


def test_noise_simulation_chain():
    sim = nf.NoiseSimulationLwe.encrypt(PARAMS.glwe.noise, PARAMS.big_lwe_dimension)
    after_ks = sim.keyswitch(PARAMS.lwe_dimension, PARAMS.ks_decomp.base_log,
                             PARAMS.ks_decomp.level_count, PARAMS.lwe.noise)
    assert after_ks.variance > sim.variance
    after_pbs = after_ks.pbs(PARAMS)
    assert after_pbs.lwe_dimension == PARAMS.big_lwe_dimension
    assert after_pbs.variance > 0
    # PBS output noise must be small relative to a 4-bit message budget
    delta = 2.0 ** (64 - MSG_BITS - 1)
    assert np.sqrt(after_pbs.variance) * 6 < delta
