"""Ciphertext list compression with DEDICATED compression parameters
(shortint/list_compression/: CompressionParameters, CompressionPrivateKeys,
CompressionKey packing keyswitch, DecompressionKey blind-rotate key).

Pipeline (compression.rs:17-60 + decompression):
  compress:   chunk <= lwe_per_glwe LWEs -> packing keyswitch into the
              dedicated STORAGE GLWE key (small N_c, larger k_c) ->
              modulus-switch every coefficient to storage_log_modulus bits
              (stored as u16 -- ~12 bits/coeff instead of 64).
  decompress: sample-extract in the switched domain; the stored modulus
              equals the blind-rotation input modulus 2N of the COMPUTE
              parameters, so each extracted LWE feeds one PBS with the
              dedicated storage->compute bootstrap key directly (no extra
              modulus switch) -- exactly the reference's decompression BR.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import keygen as kg
from ..core.encrypt import encrypt_glwe_assign
from ..core.params import DecompParams
from ..ops import ntt, server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator, SecretRandomGenerator, TUniform
from .ciphertext import NOMINAL_NOISE, Ciphertext
from .client_key import ClientKey


@dataclass(frozen=True)
class CompressionParameters:
    """shortint/parameters/list_compression.rs ClassicCompressionParameters."""

    br_level: int
    br_base_log: int
    packing_ks_level: int
    packing_ks_base_log: int
    packing_ks_polynomial_size: int
    packing_ks_glwe_dimension: int
    lwe_per_glwe: int
    storage_log_modulus: int
    packing_ks_key_noise: object  # noise distribution of the storage key's encs


# v1_4/list_compression/p_fail_2_minus_128/mod.rs:8 (TUniform 2M128 2_2)
V1_4_COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = CompressionParameters(
    br_level=1,
    br_base_log=23,
    packing_ks_level=3,
    packing_ks_base_log=4,
    packing_ks_polynomial_size=256,
    packing_ks_glwe_dimension=4,
    lwe_per_glwe=256,
    storage_log_modulus=12,
    packing_ks_key_noise=TUniform(43),
)

# pairs with TEST_PARAM_MESSAGE_2_CARRY_2 (compute N=512 -> storage mod 2^10)
TEST_COMP_PARAM = CompressionParameters(
    br_level=1,
    br_base_log=23,
    packing_ks_level=3,
    packing_ks_base_log=4,
    packing_ks_polynomial_size=256,
    packing_ks_glwe_dimension=1,
    lwe_per_glwe=256,
    storage_log_modulus=10,
    packing_ks_key_noise=TUniform(3),
)


def default_compression_parameters(compute_params) -> CompressionParameters:
    if compute_params.polynomial_size >= 2048:
        return V1_4_COMP_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    return TEST_COMP_PARAM


@dataclass
class CompressedCiphertextList:
    """Storage-domain GLWEs: coefficients hold storage_log_modulus-bit
    values (u16), exactly the blind-rotation input domain."""

    glwes: np.ndarray  # (G, k_c+1, N_c) u16, values < 2^storage_log
    storage_log_modulus: int
    count: int
    degrees: list
    message_modulus: int
    carry_modulus: int


class CompressionPrivateKeys:
    """Dedicated storage GLWE secret key (CompressionPrivateKeys)."""

    def __init__(self, comp_params: CompressionParameters, seed: int):
        self.params = comp_params
        gen = SecretRandomGenerator(seed ^ 0x1F3D5B79)
        self.post_packing_ks_key = kg.generate_binary_glwe_secret_key(
            comp_params.packing_ks_glwe_dimension,
            comp_params.packing_ks_polynomial_size, gen)


class DecompressionKey:
    """BSK from the storage key (as LWE) to the compute GLWE key."""

    def __init__(self, bsk_mont, plan, br_base_log: int, br_level: int,
                 bsk_coeff=None, bsk_floored: int = 0):
        self.bsk_mont = bsk_mont
        self.plan = plan
        self.br_base_log = br_base_log
        self.br_level = br_level
        # coefficient BSK kept for the lazy MXU-stack build (fast path)
        self._bsk_coeff = bsk_coeff
        self._bsk_floored = bsk_floored
        self._mxu = None

    def ensure_mxu(self):
        """Lazy v32/corr middle tensors for the decompression blind rotate,
        in the v8 macro-step layout whose lane minor (ss*C = 128) the
        (8,128) HBM tiling pads by NOTHING — the round-3 v5-layout build
        (C=32 minor) padded 4x and OOM'd a 16 GB chip at the 4-prime plan
        (the reference pre-checks allocations the same way,
        core_crypto/gpu/mod.rs:234 check_valid_cuda_malloc).  Mask-floored
        keys (CompressionKey keygen) ride the 3-prime rounded plan like the
        compute ServerKey: ~2.7 GB resident and ~25% fewer matmuls."""
        if self._mxu is None:
            import os

            import jax

            from ..ops import mxu as _mxu
            from .server_key import _mxu_round_bits

            n_poly = self._bsk_coeff.data.shape[-1]
            rb = _mxu_round_bits()
            if rb and self._bsk_floored >= rb:
                mplan = _mxu.make_mxu_plan(n_poly, num_primes=3,
                                           round_bits=rb)
            else:
                mplan = _mxu.make_mxu_plan(n_poly, num_primes=4,
                                           round_bits=0)
            bhat, _ = _mxu.bsk_eval_domain(self._bsk_coeff, mplan)
            # ss=1: bodies with >=2 fully unrolled steps OOM-kill the
            # Mosaic compile helper (round-5 finding — ss=4 AND ss=2 both
            # died; program size, not math, gates compiles).  ss=1 pays
            # 4x HBM tile padding on the key (2.7 -> 10.8 GB, admission-
            # controlled) but shares the exact kernel build with the
            # classic v8 path (same 2_2 shape, base 23 / l=1).
            ss = int(os.environ.get("TFHE_TPU_MXU_V8_SS", "1"))
            v32, corr = _mxu.middle_v8_from_eval_device(
                jax.device_put(bhat), mplan, self.br_base_log, ss=ss)
            self._mxu = (v32, corr, mplan)
        return self._mxu


class CompressionKey:
    """Packing keyswitch key (big compute LWE key -> storage GLWE key) plus
    the paired decompression key; built from the client key."""

    def __init__(self, client_key: ClientKey, seed: int | None = None,
                 comp_params: CompressionParameters | None = None):
        p = client_key.params
        self.params = p
        cp = comp_params or default_compression_parameters(p)
        assert cp.storage_log_modulus == p.polynomial_size.bit_length(), (
            "storage modulus must equal the compute blind-rotation input "
            "modulus log2(2N)")
        self.comp = cp
        if seed is None:
            seed = secrets.randbits(128)
        priv = CompressionPrivateKeys(cp, seed)
        self.private_keys = priv
        gen = EncryptionRandomGenerator(seed ^ 0x452821E638D01377,
                                        DeterministicSeeder(seed ^ 0xBE5466CF34E90C6C))
        storage_glwe_sk = priv.post_packing_ks_key
        big_sk = client_key.big_lwe_secret_key
        n_big = big_sk.dimension
        levels = cp.packing_ks_level
        base_log = cp.packing_ks_base_log
        n_c = cp.packing_ks_polynomial_size
        k1 = cp.packing_ks_glwe_dimension + 1
        pksk = np.zeros((n_big, levels, k1, n_c), dtype=np.uint64)
        for i in range(n_big):
            s_i = int(big_sk.data[i])
            for j in range(levels):
                level = levels - j
                body = np.zeros(n_c, dtype=np.uint64)
                body[0] = np.uint64((s_i << (p.bits - base_log * level)) % (1 << p.bits))
                ct = encrypt_glwe_assign(storage_glwe_sk, body,
                                         cp.packing_ks_key_noise, gen, p.bits)
                pksk[i, j] = ct.data
        plan = ntt.make_plan(n_c, 4)
        fwd = ntt.forward_all(pksk, plan, np)
        self.pksk_mont = jnp.asarray(ntt.to_mont_all(fwd, plan, np).astype(np.uint32))
        self.plan = plan
        # decompression BSK: storage key (as LWE) -> compute GLWE key
        storage_lwe_sk = storage_glwe_sk.as_lwe_secret_key()
        gen2 = EncryptionRandomGenerator(seed ^ 0x9216D5D98979FB1B,
                                         DeterministicSeeder(seed ^ 0xD1310BA698DFB5AC))
        br_bsk = kg.generate_lwe_bootstrap_key(
            storage_lwe_sk, client_key.glwe_secret_key,
            DecompParams(cp.br_base_log, cp.br_level), p.glwe_noise, gen2)
        # keygen-side mask flooring so decompression rides the 3-prime
        # rounded MXU plan (same policy/estimator guard as ServerKey; the
        # BSK is under the same compute GLWE key and noise)
        br_floored = 0
        from .server_key import _mxu_round_bits

        rb = _mxu_round_bits()
        if (rb > 0 and p.polynomial_size == 2048 and p.glwe_dimension == 1
                and cp.br_level == 1 and cp.br_base_log <= 23):
            from ..core import security as _sec
            from ..ops import mxu as _mxu

            kn = p.glwe_dimension * p.polynomial_size
            ok_f, _ = _sec.check_lwe_noise_secure(
                p.glwe_noise, kn, p.bits, modulus_log2_shrink=rb)
            ok_p, _ = _sec.check_lwe_noise_secure(p.glwe_noise, kn, p.bits)
            if ok_f or not ok_p:
                br_bsk = _mxu.mask_floor_bsk(
                    br_bsk, client_key.glwe_secret_key, rb)
                br_floored = rb
        bsk_mont, br_plan = kg.bootstrap_key_to_ntt(br_bsk)
        self.decompression = DecompressionKey(
            jnp.asarray(bsk_mont), br_plan, cp.br_base_log, cp.br_level,
            bsk_coeff=br_bsk, bsk_floored=br_floored)

    def compress(self, cts: list) -> CompressedCiphertextList:
        p = self.params
        cp = self.comp
        shift = np.uint64(p.bits - cp.storage_log_modulus)
        glwes = []
        for start in range(0, len(cts), cp.lwe_per_glwe):
            chunk = cts[start : start + cp.lwe_per_glwe]
            batch = jnp.asarray(np.stack([np.asarray(c.data) for c in chunk]))
            glwe = srv.packing_keyswitch(batch, self.pksk_mont, self.plan,
                                         cp.packing_ks_base_log,
                                         cp.packing_ks_level, p.bits)
            msed = np.asarray(srv.modulus_switch(
                glwe, cp.storage_log_modulus, p.bits)).astype(np.uint16)
            glwes.append(msed)
        first = cts[0]
        packed = CompressedCiphertextList(
            np.stack(glwes), cp.storage_log_modulus, len(cts),
            [c.degree for c in cts], first.message_modulus, first.carry_modulus)
        packed._decompression_key = self.decompression
        packed._compute_params = p
        return packed

    def decompress(self, packed: CompressedCiphertextList, indices=None) -> list:
        return decompress(packed, indices, self.decompression, self.params)


def decompress(packed: CompressedCiphertextList, indices=None,
               key: DecompressionKey | None = None, compute_params=None) -> list:
    """Extract slots from the storage domain and refresh each through the
    decompression blind rotation (list_compression decompression path).

    The storage-domain extraction (monomial_div by X^j + sample_extract,
    composed: a[l] = m[j-l] for l<=j, -m[N+j-l] for l>j; body = b[j]) is
    pure index shuffling on tiny u16 GLWEs, so it runs vectorized on the
    host — one device call total for the whole batch, through the fused
    Pallas blind rotate when the backend supports it."""
    import os

    import jax

    key = key or getattr(packed, "_decompression_key", None)
    compute_params = compute_params or getattr(packed, "_compute_params", None)
    if key is None or compute_params is None:
        raise ValueError("decompression requires the DecompressionKey "
                         "(use CompressionKey.decompress or pass key=)")
    p = compute_params
    n_c = packed.glwes.shape[-1]
    log_mod = packed.storage_log_modulus
    mod_mask = np.uint64((1 << log_mod) - 1)
    indices = list(range(packed.count)) if indices is None else list(indices)
    b = len(indices)
    idx_arr = np.asarray(indices, dtype=np.int64)
    g_arr, j_arr = np.divmod(idx_arr, n_c)
    glwes = packed.glwes.astype(np.uint64)          # (G, k+1, N_c)
    masks = glwes[g_arr, :-1, :]                    # (B, k, N_c)
    k = masks.shape[1]
    ll = np.arange(n_c, dtype=np.int64)
    src = (j_arr[:, None] - ll[None, :]) % n_c      # (B, N_c)
    neg = ll[None, :] > j_arr[:, None]              # sign flip for l > j
    a = np.take_along_axis(
        masks, np.broadcast_to(src[:, None, :], (b, k, n_c)), axis=-1)
    a = np.where(neg[:, None, :], (np.uint64(0) - a) & mod_mask, a)
    body = glwes[g_arr, -1, j_arr]
    msed = np.concatenate([a.reshape(b, -1), body[:, None]], axis=1)
    lut = srv.generate_lut(p.polynomial_size, p.glwe_dimension + 1,
                           p.total_modulus, p.delta, lambda x: x, p.bits)
    on_tpu = (jax.default_backend() not in ("cpu",)
              and os.environ.get("TFHE_TPU_DISABLE_PALLAS") != "1"
              and p.polynomial_size % 128 == 0
              and key.br_base_log * key.br_level <= 31)
    use_mxu = (on_tpu and getattr(key, "_bsk_coeff", None) is not None
               and p.polynomial_size == 2048 and p.glwe_dimension == 1
               and key.br_level == 1 and key.br_base_log <= 23
               and os.environ.get("TFHE_TPU_DISABLE_MXU") != "1")
    if use_mxu:
        # HBM admission (check_valid_cuda_malloc analog): chunk the batch
        # so per-element working tensors (~0.5 MB each: a_rows dominates at
        # k1*N2 rows x pad128(n_in) i32) never push past free HBM.  The
        # middle tensors count as `fixed` until ensure_mxu materializes
        # them (afterwards they show up in bytes_in_use).
        from ..utils import hbm as _hbm

        fixed = 0
        if key._mxu is None:
            n_in = key._bsk_coeff.data.shape[0]
            nprimes = 3 if getattr(key, "_bsk_floored", 0) else 4
            fixed = n_in * nprimes * 128 * 64 * 32 * 4 * 2
        chunk = _hbm.admit_chunk(b, 512 << 10, fixed_bytes=fixed)
        chunk = max(8, 1 << (chunk.bit_length() - 1))  # power-of-two bins
        tb = min(int(os.environ.get("TFHE_TPU_MXU_TB", "256")),
                 max(8, min(chunk, 1 << (b - 1).bit_length())))
        v32, corr, mplan = key.ensure_mxu()
        kernel = "v8"      # ensure_mxu builds the v8 macro-step layout
        outs = []
        for s in range(0, b, chunk):
            part = msed[s:s + chunk]
            nb = part.shape[0]
            nb_pad = -(-nb // tb) * tb
            if nb_pad != nb:
                part = np.concatenate(
                    [part, np.repeat(part[:1], nb_pad - nb, 0)], 0)
            lut_b = jnp.asarray(np.broadcast_to(lut, (nb_pad,) + lut.shape))
            outs.append(np.asarray(srv.pbs_from_switched_batch_mxu(
                jnp.asarray(part), lut_b, v32, corr, mplan,
                key.br_base_log, key.br_level, p.bits, tb=tb,
                kernel=kernel))[:nb])
        out = np.concatenate(outs, axis=0)
    else:
        b_pad = ((b + 7) // 8) * 8 if on_tpu else b
        if b_pad != b:
            msed = np.concatenate(
                [msed, np.repeat(msed[:1], b_pad - b, 0)], 0)
        lut_b = jnp.asarray(np.broadcast_to(lut, (b_pad,) + lut.shape))
        out = np.asarray(srv.pbs_from_switched_batch(
            jnp.asarray(msed), lut_b, key.bsk_mont, key.plan,
            key.br_base_log, key.br_level, p.bits, on_tpu))[:b]
    return [Ciphertext(out[i], packed.degrees[idx], NOMINAL_NOISE,
                       packed.message_modulus, packed.carry_modulus)
            for i, idx in enumerate(indices)]
