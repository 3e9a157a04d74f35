"""shortint server key: batched LUT application + the four-flavor op set.

The reference applies one PBS per ciphertext inside rayon loops
(shortint/server_key/mod.rs:974 apply_lookup_table); here the primitive is a
*batched* LUT apply — a list of ciphertexts and per-element LUTs go through
one fused jitted KS->MS->BR->SE program (ops/server.py ks_pbs_batch).  The
integer layer above coalesces whole rounds of block PBS into single calls.

Op flavors follow the reference convention (server_key/add.rs:41-303):
  unchecked_* (no checks) / checked_* (error on overflow risk) /
  smart_* (bootstraps operands when needed) / default (clean carry in/out).
Degree/NoiseLevel bookkeeping mirrors ciphertext/common.rs.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import keygen as kg
from ..ops import server as srv
from ..utils.csprng import DeterministicSeeder, EncryptionRandomGenerator
from .ciphertext import (NOMINAL_NOISE, Ciphertext, DeviceLweBatch,
                         LazyLweData)
from .client_key import ClientKey
from .params import (EncryptionKeyChoice, MsNoiseReduction,
                     ShortintParams)


class CarryFullError(Exception):
    """checked_* flavor failure (the reference's CheckError): the operation
    would exceed the degree or noise budget."""


_M64 = 1 << 64


def _device_resident() -> bool:
    """Keep PBS-round outputs on device as LazyLweData (default on;
    TFHE_TPU_DEVICE_RESIDENT=0 restores eager host materialization)."""
    import os

    return os.environ.get("TFHE_TPU_DEVICE_RESIDENT", "1") != "0"


@jax.jit
def _lazy_combine_jit(parent, idx, coef):
    """sum_j coef[:, j] * parent[idx[:, j]] (wrapping u64)."""
    return (coef[:, :, None] * parent[idx]).sum(axis=1, dtype=jnp.uint64)


def _stack_lazy_batch(datas, width):
    """Compile a round's input linear forms into ONE device gather+combine.

    datas: list of LazyLweData / np.ndarray.  Returns a (B, width) u64
    device array.  Rows referencing prior-round DeviceLweBatch parents
    never touch the host; fresh host ciphertexts ride the const upload.
    """
    lazies = [d if isinstance(d, LazyLweData)
              else LazyLweData((), np.asarray(d), width) for d in datas]
    parents: dict = {}
    for lz in lazies:
        for _, h, _ in lz.terms:
            parents.setdefault(id(h), h)
    plist = list(parents.values())
    offs, off = {}, 0
    for h in plist:
        offs[id(h)] = off
        off += int(h.arr.shape[0])
    t_max = max((len(lz.terms) for lz in lazies), default=0)
    b = len(lazies)
    consts = None
    for i, lz in enumerate(lazies):
        if lz.const is not None:
            if consts is None:
                consts = np.zeros((b, width), np.uint64)
            consts[i] = lz.const
    if not plist:
        return jnp.asarray(consts if consts is not None
                           else np.zeros((b, width), np.uint64))
    t_pad = 1 << (t_max - 1).bit_length() if t_max > 1 else 1
    idx = np.zeros((b, t_pad), np.int32)
    coef = np.zeros((b, t_pad), np.uint64)
    for i, lz in enumerate(lazies):
        for j, (c, h, r) in enumerate(lz.terms):
            idx[i, j] = offs[id(h)] + r
            coef[i, j] = c % _M64
    cat = (plist[0].arr if len(plist) == 1
           else jnp.concatenate([h.arr for h in plist]))
    batch = _lazy_combine_jit(cat, jnp.asarray(idx), jnp.asarray(coef))
    if consts is not None:
        batch = batch + jnp.asarray(consts)
    return batch



@dataclass
class LookupTable:
    acc: np.ndarray  # (k+1, N) uint64 trivial GLWE accumulator
    degree: int


@dataclass
class ManyLookupTable:
    """server_key/mod.rs ManyLookupTable: one accumulator evaluating several
    functions; outputs extracted at coefficient i*stride."""

    acc: np.ndarray
    stride: int
    degrees: tuple
    input_max_degree: int


@dataclass
class CompressedModulusSwitchedCiphertext:
    """shortint/ciphertext/compressed_modulus_switched_ciphertext.rs analog:
    a ciphertext stored AFTER keyswitch + modulus switch — log2(2N) bits per
    coefficient instead of 64 (~5x smaller at 2_2 params).  Decompression is
    the remaining blind-rotate + extract with any LUT (a PBS is mandatory,
    which also refreshes noise)."""

    packed: np.ndarray  # uint8 bit-packed little-endian stream
    count: int          # n_small + 1 stored values
    log_modulus: int    # values are in [0, 2N), 1 + log2(N) bits each
    degree: int
    message_modulus: int
    carry_modulus: int


def _pack_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """PackedIntegers analog: width-bit little-endian packing into bytes."""
    bits = ((vals[:, None].astype(np.uint64) >> np.arange(width, dtype=np.uint64))
            & np.uint64(1)).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little")


def _unpack_bits(packed: np.ndarray, width: int, count: int) -> np.ndarray:
    bits = np.unpackbits(packed, bitorder="little")[: width * count]
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.reshape(count, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)


def _mxu_family(p) -> bool:
    """Parameter families the MXU blind-rotate stack covers (static — must
    not depend on the runtime backend, so keys built on CPU and TPU are
    identical)."""
    from .params import EncryptionKeyChoice as _EKC

    return (p.polynomial_size == 2048 and p.glwe_dimension == 1
            and p.pbs_level == 1 and p.pbs_base_log <= 23
            and getattr(p, "grouping_factor", None) is None
            and getattr(p, "encryption_key_choice", _EKC.BIG) == _EKC.BIG)


def _mxu_round_bits() -> int:
    """Resolved BSK rounding for the MXU stack (3-prime default rb=15)."""
    import os

    nprimes = int(os.environ.get("TFHE_TPU_MXU_PRIMES", "3"))
    return int(os.environ.get("TFHE_TPU_MXU_ROUND_BITS",
                              "15" if nprimes == 3 else "0"))


def _mxu_family_mb(p) -> bool:
    """Multi-bit families the fused v9 MXU kernel covers (static; see
    _mxu_family)."""
    from .params import EncryptionKeyChoice as _EKC

    g = getattr(p, "grouping_factor", None)
    return (g in (2, 3, 4) and p.polynomial_size == 2048
            and p.glwe_dimension == 1 and p.pbs_level == 1
            and p.pbs_base_log <= 23
            and p.lwe_dimension % g == 0 and 128 % (2 * (1 << g)) == 0
            and getattr(p, "encryption_key_choice", _EKC.BIG) == _EKC.BIG
            and not getattr(p, "ks32", False))


def _mxu_mb_round_bits(p) -> int:
    """Resolved BSK rounding for the fused multi-bit kernel: the minimal rb
    whose grouped CRT bound fits the 3-prime product (env-overridable)."""
    import math
    import os

    from ..ops import mxu as _mxu

    if os.environ.get("TFHE_TPU_MXU_MB_ROUND_BITS"):
        return int(os.environ["TFHE_TPU_MXU_MB_ROUND_BITS"])
    if int(os.environ.get("TFHE_TPU_MXU_PRIMES", "3")) != 3:
        return 0
    prod = math.prod(_mxu.MXU_PRIMES[:3])
    g = p.grouping_factor
    for rb in range(10, 25):
        bmax = ((1 << 63) >> rb) + 1
        max_x = (1 << g) * p.pbs_level * (p.glwe_dimension + 1) \
            * p.polynomial_size * (1 << (p.pbs_base_log - 1)) * bmax
        if prod > 2 * max_x:
            return rb
    return 0


class ServerKey:
    def __init__(self, client_key: ClientKey, seed: int | None = None):
        p = client_key.params
        if seed is None:
            seed = secrets.randbits(128)
        gen = EncryptionRandomGenerator(seed, DeterministicSeeder(seed ^ 0xB5297A4D))
        core = p.core
        ksk = kg.generate_lwe_keyswitch_key(
            client_key.big_lwe_secret_key, client_key.lwe_secret_key,
            core.ks_decomp, p.lwe_noise, gen,
            32 if getattr(p, "ks32", False) else p.bits,
        )
        if getattr(p, "grouping_factor", None):
            # MultiBit arm (shortint/server_key/mod.rs:165): 2^g subset GGSWs
            # per group of g key bits; n/g CMux steps at rotation time
            from ..core import multibit as mb

            mb_bsk = mb.generate_multibit_bootstrap_key(
                client_key.lwe_secret_key, client_key.glwe_secret_key,
                core.pbs_decomp, p.grouping_factor, p.glwe_noise, gen, p.bits)
            self._mb_floored = 0
            if _mxu_family_mb(p) and _mxu_mb_round_bits(p) > 0:
                # same keygen-side mask flooring + estimator guard as the
                # classic arm (each indicator-pattern GGSW is a GLWE
                # ciphertext under the same key; the fused kernel consumes
                # the flattened pattern key — ops/mxu.multibit_bsk_to_mxu)
                from ..core import security as _sec
                from ..core.entities import LweBootstrapKey
                from ..ops import mxu as _mxu

                rb = _mxu_mb_round_bits(p)
                kn = p.glwe_dimension * p.polynomial_size
                ok_f, detail = _sec.check_lwe_noise_secure(
                    p.glwe_noise, kn, p.bits, modulus_log2_shrink=rb)
                ok_p, _ = _sec.check_lwe_noise_secure(p.glwe_noise, kn,
                                                      p.bits)
                if ok_f or not ok_p:
                    shape = mb_bsk.shape
                    flat = LweBootstrapKey(
                        mb_bsk.reshape((-1,) + shape[2:]), core.pbs_decomp,
                        p.bits)
                    floored = _mxu.mask_floor_bsk(
                        flat, client_key.glwe_secret_key, rb)
                    mb_bsk = floored.data.reshape(shape)
                    self._mb_floored = rb
                else:
                    raise ValueError(
                        f"multi-bit BSK mask flooring at rb={rb} would "
                        f"degrade a secure set below the estimator curve: "
                        f"{detail}; use 4 primes")
            mb_mont, plan = mb.multibit_bsk_to_ntt(mb_bsk)
            self.params = p
            self.ksk = jnp.asarray(np.asarray(ksk.data))
            self.bsk_mont = None
            self.mb_bsk_mont = jnp.asarray(mb_mont)
            self._mb_bsk_coeff = mb_bsk     # for the fused v9 key build
            self.plan = plan
            self.max_degree = p.total_modulus - 1
            self.max_noise_level = p.max_noise_level
            self.pbs_count = 0
            self.drift_zeros = None
            return
        bsk = kg.generate_lwe_bootstrap_key(
            client_key.lwe_secret_key, client_key.glwe_secret_key,
            core.pbs_decomp, p.glwe_noise, gen, p.bits,
        )
        if _mxu_family(p) and _mxu_round_bits() > 0:
            # Keygen-side, phase-preserving mask alignment so the 3-prime
            # MXU stack's BSK rounding only perturbs bodies (kills the
            # (1+k*N/2) mask-error amplification; zero noise cost here and
            # for the v2/XLA paths, which share this key).  See
            # ops/mxu.mask_floor_bsk + tests/test_noise_rounded_bsk.py.
            # Security guard: the floored key is a GLWE instance over
            # effective modulus 2^(64-rb) with the same absolute noise —
            # only floor when that instance still meets the estimator
            # curves (core/security; e.g. production TUniform(17) at rb=15
            # leaves exactly the minimal TUniform(2) on the 2^49 grid).
            # Flooring an already-insecure test set is harmless and keeps
            # the fast path exercised in tests.
            from ..core import security as _sec
            from ..ops import mxu as _mxu

            rb = _mxu_round_bits()
            kn = p.glwe_dimension * p.polynomial_size
            ok_floored, detail = _sec.check_lwe_noise_secure(
                p.glwe_noise, kn, p.bits, modulus_log2_shrink=rb)
            ok_plain, _ = _sec.check_lwe_noise_secure(p.glwe_noise, kn,
                                                      p.bits)
            if ok_floored or not ok_plain:
                bsk = _mxu.mask_floor_bsk(bsk, client_key.glwe_secret_key,
                                          rb)
                self._bsk_floored = rb
            else:
                raise ValueError(
                    f"BSK mask flooring at rb={rb} would degrade a secure "
                    f"parameter set below the estimator curve: {detail}; "
                    "lower TFHE_TPU_MXU_ROUND_BITS or use 4 primes")
        self.drift_zeros = None
        if p.ms_noise_reduction == MsNoiseReduction.DRIFT:
            from ..core.encrypt import encrypt_lwe

            zeros = [encrypt_lwe(client_key.lwe_secret_key, 0, p.lwe_noise,
                                 gen, p.bits).data
                     for _ in range(p.drift_zeros_count)]
            self.drift_zeros = jnp.asarray(np.stack(zeros))
        self._init_from_raw(p, ksk.data, bsk.data)

    @classmethod
    def from_raw_keys(cls, params: ShortintParams, ksk_data, bsk_data,
                      bsk_floored: int = 0) -> "ServerKey":
        """Build from standard-domain KSK/BSK arrays (decompression path).
        bsk_floored: rb the BSK masks are floored to (CompressedServerKey
        sets it so the MXU fast plan stays available)."""
        obj = cls.__new__(cls)
        obj._bsk_floored = bsk_floored
        obj._init_from_raw(params, ksk_data, bsk_data)
        return obj

    def _init_from_raw(self, p: ShortintParams, ksk_data, bsk_data) -> None:
        from ..core.entities import LweBootstrapKey

        self.params = p
        bsk = (bsk_data if isinstance(bsk_data, LweBootstrapKey)
               else LweBootstrapKey(np.asarray(bsk_data), p.core.pbs_decomp, p.bits))
        bsk_mont, plan = kg.bootstrap_key_to_ntt(bsk)
        self.ksk = jnp.asarray(np.asarray(ksk_data))
        self.bsk_mont = jnp.asarray(bsk_mont)
        self.mb_bsk_mont = None
        self.plan = plan
        self.max_degree = p.total_modulus - 1
        self.max_noise_level = p.max_noise_level
        self.pbs_count = 0  # pbs-stats analog (shortint/server_key/mod.rs:69)
        # coefficient-domain BSK kept (53 MB at 2_2) for the lazy MXU-engine
        # middle-tensor build (_ensure_mxu); None disables the MXU path
        self._bsk_coeff = bsk
        # rb the masks are floored to (set by __init__/keycache); an
        # UNfloored key (from_raw_keys — no secret available) must not be
        # rounded, or the (1+kN/2)-amplified noise breaks the pfail claim:
        # _ensure_mxu falls back to 4-prime rb=0 for those.
        self._bsk_floored = getattr(self, "_bsk_floored", 0)

    @property
    def use_pallas(self) -> bool:
        """Fused Pallas blind rotate on real TPU; XLA path on CPU (tests) and
        for shapes the kernel does not cover (a property so that unpickled
        key-cache entries from before this flag keep working)."""
        import os

        p = self.params
        return (
            getattr(self, "mb_bsk_mont", None) is None  # no multibit kernel yet
            and jax.default_backend() not in ("cpu",)
            and os.environ.get("TFHE_TPU_DISABLE_PALLAS") != "1"
            and p.polynomial_size % 128 == 0
            and p.pbs_base_log * p.pbs_level <= 31
        )

    @property
    def use_mxu(self) -> bool:
        """MXU-factorized blind-rotate stack (the fused pallas_mxu kernel):
        the production path on real TPU for the classic 2_2-shaped families.
        ~2x the v2 VPU kernel end-to-end (STATUS.md round-2 measurements)."""
        import os

        p = self.params
        return (
            self.use_pallas
            and getattr(self, "_bsk_coeff", None) is not None
            and os.environ.get("TFHE_TPU_DISABLE_MXU") != "1"
            and p.polynomial_size == 2048   # middle tensors scale as N2^2
            and p.glwe_dimension == 1
            and p.pbs_level == 1
        )

    @property
    def use_mxu_multibit(self) -> bool:
        """Fused v9 multi-bit kernel (indicator pattern keys) — the multi-bit
        production path on real TPU."""
        import os

        return (
            getattr(self, "mb_bsk_mont", None) is not None
            and getattr(self, "_mb_bsk_coeff", None) is not None
            and jax.default_backend() not in ("cpu",)
            and os.environ.get("TFHE_TPU_DISABLE_PALLAS") != "1"
            and os.environ.get("TFHE_TPU_DISABLE_MXU") != "1"
            and _mxu_family_mb(self.params)
            and getattr(self, "_mb_floored", 0) >= _mxu_mb_round_bits(
                self.params)
        )

    def _ensure_mxu_mb(self):
        """Lazy build of the fused multi-bit middle tensors (v32, corr) on
        device.  Env knobs: TFHE_TPU_MXU_SS (2), TFHE_TPU_MXU_MB_ROUND_BITS,
        TFHE_TPU_MXU_TB."""
        if getattr(self, "_mxu_mb_m", None) is None:
            import os

            from ..ops import mxu

            p = self.params
            rb = _mxu_mb_round_bits(p)
            nprimes = int(os.environ.get("TFHE_TPU_MXU_PRIMES", "3"))
            mplan = mxu.make_mxu_plan(p.polynomial_size, num_primes=nprimes,
                                      round_bits=rb)
            ss = int(os.environ.get("TFHE_TPU_MXU_SS", "4"))
            tl = os.environ.get("TFHE_TPU_MXU_TL", "1") == "1" and (
                (1 << p.grouping_factor) * (p.glwe_dimension + 1)
                * (p.polynomial_size // 128) == 128)
            bhat = mxu.multibit_eval_domain(
                self._mb_bsk_coeff, p.core.pbs_decomp, mplan,
                p.grouping_factor)
            v32, corr = mxu.middle_v9_from_eval_device(
                jax.device_put(bhat), mplan, p.pbs_base_log,
                p.grouping_factor, ss=ss,
                subset_major=("t_lanes" if tl else True))
            self._mxu_mb_m = v32
            self._mxu_mb_corr = corr
            self._mxu_mb_plan = mplan
            self._mxu_mb_tl = tl
        return self._mxu_mb_m, self._mxu_mb_corr, self._mxu_mb_plan

    def _ensure_poly_shard(self, mesh, axis_name: str = "poly"):
        """Lazy poly-sharded eval-domain BSK for the latency mesh path
        (parallel/poly_shard.prepare_bsk_poly_sharded), cached per mesh."""
        key = (id(mesh), axis_name)
        cache = getattr(self, "_poly_shard_cache", None)
        if cache is None:
            cache = self._poly_shard_cache = {}
        if key not in cache:
            from ..parallel import poly_shard as _ps

            cache[key] = _ps.prepare_bsk_poly_sharded(
                mesh, jnp.asarray(np.asarray(self._bsk_coeff.data)),
                axis_name=axis_name)
        return cache[key]

    def _ensure_mxu(self):
        """Lazy one-time build of the MXU engine's middle tensors on device
        (~1.4 GB at 3-prime 2_2; ~70 s first time).  Env knobs:
        TFHE_TPU_MXU_PRIMES (3), TFHE_TPU_MXU_ROUND_BITS (15 when 3-prime),
        TFHE_TPU_MXU_FOLD (solinas), TFHE_TPU_MXU_TB (128),
        TFHE_TPU_MXU_KERNEL (v3 | v4 | v5 | v6 | v7 | v8)."""
        if getattr(self, "_mxu_m", None) is None:
            import os

            from ..ops import mxu

            p = self.params
            nprimes = int(os.environ.get("TFHE_TPU_MXU_PRIMES", "3"))
            rb = int(os.environ.get("TFHE_TPU_MXU_ROUND_BITS",
                                    "15" if nprimes == 3 else "0"))
            if rb and getattr(self, "_bsk_floored", 0) < rb:
                # unfloored key (from_raw_keys): rounding it would pay the
                # (1+kN/2)-amplified noise — use the exact 4-prime plan
                nprimes, rb = 4, 0
            fold = os.environ.get("TFHE_TPU_MXU_FOLD", "solinas")
            kernel = os.environ.get("TFHE_TPU_MXU_KERNEL", "v7")
            mplan = mxu.make_mxu_plan(p.polynomial_size, num_primes=nprimes,
                                      round_bits=rb)
            bhat, _ = mxu.bsk_eval_domain(self._bsk_coeff, mplan,
                                          mont=(fold == "redc"))
            bhat_d = jax.device_put(bhat)
            self._mxu_corr = None
            if kernel == "v8":
                ss = int(os.environ.get("TFHE_TPU_MXU_V8_SS", "1"))
                self._mxu_m, self._mxu_corr = mxu.middle_v8_from_eval_device(
                    bhat_d, mplan, p.pbs_base_log, ss=ss)
            elif kernel in ("v5", "v6", "v7"):
                self._mxu_m, self._mxu_corr = mxu.middle_v5_from_eval_device(
                    bhat_d, mplan)
            elif kernel == "v4":
                self._mxu_m = mxu.transpose_middle(
                    mxu.middle_from_eval_device(bhat_d, mplan))
            else:
                self._mxu_m = mxu.middle_from_eval_device(bhat_d, mplan)
            self._mxu_plan = mplan
            self._mxu_fold = fold
            self._mxu_kernel = kernel
        return (self._mxu_m, self._mxu_plan, self._mxu_fold,
                self._mxu_kernel, self._mxu_corr)

    # ------------------------------------------------------------------
    # Lookup tables
    # ------------------------------------------------------------------

    def generate_lookup_table(self, f) -> LookupTable:
        p = self.params
        total = p.total_modulus
        outputs = [int(f(x)) % total for x in range(total)]
        acc = srv.generate_lut(p.polynomial_size, p.glwe_dimension + 1, total,
                               p.delta, lambda x: outputs[x], p.bits)
        return LookupTable(acc, degree=max(outputs))

    def generate_msg_lookup_table(self, f) -> LookupTable:
        """LUT of f(x % msg) % msg (clears carries)."""
        p = self.params
        return self.generate_lookup_table(lambda x: int(f(x % p.message_modulus)) % p.message_modulus)

    def generate_lookup_table_bivariate(self, f) -> LookupTable:
        """Packed-operand LUT: input lhs*msg + rhs (bivariate_pbs.rs:110)."""
        p = self.params
        m = p.message_modulus

        def packed(x):
            return int(f((x // m) % m, x % m))

        return self.generate_lookup_table(packed)

    # ------------------------------------------------------------------
    # Batched PBS primitive
    # ------------------------------------------------------------------

    def apply_lookup_table_batch(self, cts: list[Ciphertext],
                                 luts) -> list[Ciphertext]:
        """One fused batched KS->PBS for a list of ciphertexts.

        luts: a single LookupTable (shared) or a list of per-element tables.
        """
        p = self.params
        if isinstance(luts, LookupTable):
            luts = [luts] * len(cts)
        assert len(luts) == len(cts)
        n_real = len(cts)
        # bucket the batch size to powers of two: bounds the number of
        # distinct XLA programs (compile cost), like CUDA kernel occupancy bins
        n_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if self.use_pallas and n_pad % 8 != 0:
            n_pad = ((n_pad + 7) // 8) * 8
        datas = ([c.data for c in cts] + [cts[0].data] * (n_pad - n_real))
        if any(isinstance(d, LazyLweData) for d in datas):
            width = (datas[0].width if isinstance(datas[0], LazyLweData)
                     else np.asarray(datas[0]).shape[-1])
            batch = _stack_lazy_batch(datas, width)
        else:
            batch = np.stack([np.asarray(d) for d in datas])
        # upload each DISTINCT table once and gather on device — a shared
        # LUT over a large batch would otherwise ship B identical copies
        # (at batch 2048 that is ~67 MB of redundant host->device traffic
        # per PBS round)
        uniq: dict = {}
        lut_idx = []
        for t in luts:
            key = id(t.acc)
            if key not in uniq:
                uniq[key] = (len(uniq), t.acc)
            lut_idx.append(uniq[key][0])
        lut_idx += [lut_idx[0]] * (n_pad - n_real)
        uniq_arr = np.stack([acc for _, acc in uniq.values()])
        if len(uniq) == 1:
            lut_b = jnp.broadcast_to(jnp.asarray(uniq_arr[0]),
                                     (n_pad,) + uniq_arr.shape[1:])
        else:
            lut_b = jnp.take(jnp.asarray(uniq_arr),
                             jnp.asarray(np.array(lut_idx, np.int32)), axis=0)
        from ..parallel import poly_shard as _ps

        lmesh = _ps.latency_mesh()
        if (lmesh is not None and n_real <= _ps.latency_threshold()
                and getattr(self, "mb_bsk_mont", None) is None
                and p.encryption_key_choice == EncryptionKeyChoice.BIG
                and not getattr(p, "ks32", False)
                and self.drift_zeros is None
                and getattr(self, "_bsk_coeff", None) is not None):
            # latency path: ONE PBS uses the whole mesh (poly-axis split of
            # each CMux step; VERDICT r2 task 4)
            mesh, axis = lmesh
            out = _ps.sharded_ks_pbs_poly(
                mesh, jnp.asarray(batch), jnp.asarray(lut_b), self.ksk,
                self._ensure_poly_shard(mesh, axis),
                p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
                p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                axis_name=axis)
        elif p.encryption_key_choice == EncryptionKeyChoice.SMALL:
            # PBS->KS ordering (PBSOrder::BootstrapKeyswitch): small-key
            # ciphertexts bootstrap first, then keyswitch back down
            out = srv.pbs_ks_batch(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk,
                self.bsk_mont, self.plan, p.ks_base_log, p.ks_level,
                p.pbs_base_log, p.pbs_level, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                self.use_pallas,
            )
        elif self.use_mxu_multibit:
            import os

            v32, corr, mplan = self._ensure_mxu_mb()
            tb = min(int(os.environ.get("TFHE_TPU_MXU_TB", "128")),
                     batch.shape[0])
            ss = int(os.environ.get("TFHE_TPU_MXU_SS", "4"))
            out = srv.ks_pbs_batch_mxu_multibit(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk, v32, corr,
                mplan, p.ks_base_log, p.ks_level, p.pbs_base_log,
                p.pbs_level, p.grouping_factor, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN, tb,
                getattr(p, "ks32", False), ss=ss,
                t_lanes=getattr(self, "_mxu_mb_tl", False),
            )
        elif getattr(self, "mb_bsk_mont", None) is not None:
            out = srv.ks_pbs_batch_multibit(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk,
                self.mb_bsk_mont, self.plan, p.ks_base_log, p.ks_level,
                p.pbs_base_log, p.pbs_level, p.grouping_factor, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                getattr(p, "ks32", False),
                getattr(self, "drift_zeros", None),
                p.drift_r_sigma, p.drift_ms_bound,
                p.drift_input_variance * (2.0 ** 64) ** 2,
            )
        elif self.use_mxu:
            import os

            m, mplan, fold, kernel, corr = self._ensure_mxu()
            # padded batch is a power of two >= 8: tb always divides it
            tb = min(int(os.environ.get("TFHE_TPU_MXU_TB", "256")),
                     batch.shape[0])
            out = srv.ks_pbs_batch_mxu(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk, m, mplan,
                p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
                p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN, tb,
                getattr(p, "ks32", False),
                getattr(self, "drift_zeros", None),
                p.drift_r_sigma, p.drift_ms_bound,
                p.drift_input_variance * (2.0 ** 64) ** 2,
                fold_mode=fold, kernel=kernel, corr_mid=corr,
            )
        else:
            out = srv.ks_pbs_batch(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk, self.bsk_mont, self.plan,
                p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                self.use_pallas,
                getattr(p, "ks32", False),
                getattr(self, "drift_zeros", None),
                p.drift_r_sigma, p.drift_ms_bound,
                p.drift_input_variance * (2.0 ** 64) ** 2,
            )
        self.pbs_count += n_real
        if _device_resident():
            # keep the round's outputs on device: consumers that only feed
            # the next PBS round (the integer layer / scheduler) never cross
            # the host link; everything else materializes via __array__
            handle = DeviceLweBatch(out)
            w = int(out.shape[-1])
            return [
                c.with_data(LazyLweData(((1, handle, i),), None, w),
                            degree=luts[i].degree, noise_level=NOMINAL_NOISE)
                for i, c in enumerate(cts)
            ]
        out_np = np.asarray(out)[:n_real]
        return [
            c.with_data(out_np[i], degree=luts[i].degree, noise_level=NOMINAL_NOISE)
            for i, c in enumerate(cts)
        ]

    def apply_lookup_table(self, ct: Ciphertext, lut: LookupTable) -> Ciphertext:
        return self.apply_lookup_table_batch([ct], lut)[0]

    # ------------------------------------------------------------------
    # modulus-switched compression (server_key/modulus_switched_compression.rs)
    # ------------------------------------------------------------------

    def switch_modulus_and_compress(self, ct: Ciphertext) -> CompressedModulusSwitchedCiphertext:
        """Run the KS+MS half of the atomic pattern now and store the result
        in log2(2N) bits per coefficient.  Decompression performs the
        remaining blind rotation with a caller-chosen LUT."""
        p = self.params
        log_mod = p.polynomial_size.bit_length()  # log2(N) + 1
        msed = np.asarray(srv.ks_ms_batch(
            jnp.asarray(np.asarray(ct.data)[None]), self.ksk, log_mod,
            p.ks_base_log, p.ks_level, p.bits,
            p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
            getattr(p, "ks32", False),
            getattr(self, "drift_zeros", None),
            p.drift_r_sigma, p.drift_ms_bound,
            p.drift_input_variance * (2.0 ** 64) ** 2,
        ))[0]
        return CompressedModulusSwitchedCiphertext(
            _pack_bits(msed, log_mod), len(msed), log_mod, ct.degree,
            p.message_modulus, p.carry_modulus)

    def decompress_and_apply_lookup_table(
            self, compressed: CompressedModulusSwitchedCiphertext,
            lut: LookupTable) -> Ciphertext:
        return self.decompress_and_apply_lookup_table_batch(
            [compressed], lut)[0]

    def decompress_and_apply_lookup_table_batch(
            self, compressed_list: list, luts) -> list:
        """Batched decompression: unpack the stored post-MS values and run
        ONE fused blind-rotate + extract for the whole list."""
        p = self.params
        if isinstance(luts, LookupTable):
            luts = [luts] * len(compressed_list)
        n_real = len(compressed_list)
        msed = np.stack([_unpack_bits(c.packed, c.log_modulus, c.count)
                         for c in compressed_list])
        lut_b = np.stack([t.acc for t in luts])
        n_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if self.use_pallas:
            n_pad = ((max(n_pad, 8) + 7) // 8) * 8
        if n_pad > n_real:
            msed = np.concatenate(
                [msed, np.broadcast_to(msed[:1], (n_pad - n_real,) + msed.shape[1:])])
            lut_b = np.concatenate(
                [lut_b, np.broadcast_to(lut_b[:1], (n_pad - n_real,) + lut_b.shape[1:])])
        if getattr(self, "mb_bsk_mont", None) is not None:
            out = np.asarray(srv.pbs_from_switched_batch_multibit(
                jnp.asarray(msed), jnp.asarray(lut_b), self.mb_bsk_mont,
                self.plan, p.pbs_base_log, p.pbs_level, p.grouping_factor,
                p.bits))[:n_real]
        else:
            out = np.asarray(srv.pbs_from_switched_batch(
                jnp.asarray(msed), jnp.asarray(lut_b), self.bsk_mont, self.plan,
                p.pbs_base_log, p.pbs_level, p.bits, self.use_pallas))[:n_real]
        self.pbs_count += n_real
        return [
            Ciphertext(out[i], luts[i].degree, NOMINAL_NOISE,
                       c.message_modulus, c.carry_modulus)
            for i, c in enumerate(compressed_list)
        ]

    # ------------------------------------------------------------------
    # many-LUT: several functions evaluated by ONE PBS
    # ------------------------------------------------------------------

    def generate_many_lookup_table(self, functions) -> "ManyLookupTable":
        """Pack up to total/2 functions into one accumulator; the input
        degree budget shrinks to total/len - 1 (engine/mod.rs:170
        fill_many_lut_accumulator)."""
        p = self.params
        total = p.total_modulus
        n = p.polynomial_size
        box = n // total
        fn_c = len(functions)
        assert fn_c <= total // 2, f"at most {total // 2} functions"
        max_deg = total // fn_c - 1
        stride = (max_deg + 1) * box
        acc = np.zeros(n, dtype=np.uint64)
        degrees = []
        mask64 = (1 << 64) - 1
        for i, f in enumerate(functions):
            deg = 0
            for v in range(max_deg + 1):
                out = int(f(v)) % total
                deg = max(deg, out)
                acc[i * stride + v * box : i * stride + (v + 1) * box] = \
                    (out * p.delta) & mask64
            degrees.append(deg)
        half_box = box // 2
        acc[:half_box] = (-acc[:half_box].astype(np.int64)).astype(np.uint64)
        acc = np.roll(acc, -half_box)
        glwe = np.zeros((p.glwe_dimension + 1, n), dtype=np.uint64)
        glwe[-1] = acc
        return ManyLookupTable(glwe, stride, tuple(degrees), max_deg)

    def apply_many_lookup_table(self, ct: Ciphertext,
                                mlut: "ManyLookupTable") -> list:
        return self.apply_many_lookup_table_batch([ct], mlut)[0]

    def apply_many_lookup_table_batch(self, cts: list,
                                      mlut: "ManyLookupTable") -> list:
        """Returns, per input ciphertext, one output per packed function —
        all from a single batched blind rotation."""
        p = self.params
        for c in cts:
            assert c.degree <= mlut.input_max_degree, (
                f"degree {c.degree} exceeds the many-LUT budget "
                f"{mlut.input_max_degree}")
        n_real = len(cts)
        n_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if self.use_pallas and n_pad % 8 != 0:
            n_pad = ((n_pad + 7) // 8) * 8
        batch = np.stack([np.asarray(c.data) for c in cts] +
                         [np.asarray(cts[0].data)] * (n_pad - n_real))
        lut_b = np.broadcast_to(mlut.acc, (n_pad,) + mlut.acc.shape)
        offsets = tuple(i * mlut.stride for i in range(len(mlut.degrees)))
        if getattr(self, "mb_bsk_mont", None) is not None:
            log_mod = p.polynomial_size.bit_length()
            msed = srv.ks_ms_batch(
                jnp.asarray(batch), self.ksk, log_mod, p.ks_base_log,
                p.ks_level, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                getattr(p, "ks32", False),
                getattr(self, "drift_zeros", None),
                p.drift_r_sigma, p.drift_ms_bound,
                p.drift_input_variance * (2.0 ** 64) ** 2)
            out = srv.pbs_many_from_switched_multibit(
                msed, jnp.asarray(lut_b), self.mb_bsk_mont, self.plan,
                p.pbs_base_log, p.pbs_level, p.grouping_factor, offsets,
                p.bits)
        else:
            out = srv.ks_pbs_many_batch(
                jnp.asarray(batch), jnp.asarray(lut_b), self.ksk, self.bsk_mont,
                self.plan, p.ks_base_log, p.ks_level, p.pbs_base_log, p.pbs_level,
                offsets, p.bits,
                p.ms_noise_reduction == MsNoiseReduction.CENTERED_MEAN,
                self.use_pallas,
                getattr(p, "ks32", False),
                getattr(self, "drift_zeros", None),
                p.drift_r_sigma, p.drift_ms_bound,
                p.drift_input_variance * (2.0 ** 64) ** 2,
            )
        out_np = np.asarray(out)[:n_real]
        self.pbs_count += n_real
        return [
            [cts[i].with_data(out_np[i, j], degree=mlut.degrees[j],
                              noise_level=NOMINAL_NOISE)
             for j in range(len(mlut.degrees))]
            for i in range(n_real)
        ]

    # ------------------------------------------------------------------
    # Linear (leveled) ops — no PBS
    # ------------------------------------------------------------------

    def unchecked_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return a.with_data(a.data + b.data, degree=a.degree + b.degree,
                           noise_level=a.noise_level + b.noise_level)

    @staticmethod
    def _add_to_body(data, scalar: np.uint64):
        """Add a plaintext offset to the body element only (wrapping mod 2^64
        is the torus semantics — numpy's scalar-overflow warning is silenced
        deliberately so a real overflow bug elsewhere still warns).  Lazy
        device-resident data stays lazy (the offset rides the const term)."""
        if isinstance(data, LazyLweData):
            vec = np.zeros(data.width, np.uint64)
            with np.errstate(over="ignore"):
                vec[-1] = scalar
            return data + vec
        out = np.array(data)
        with np.errstate(over="ignore"):
            out[..., -1] = out[..., -1] + scalar
        return out

    def unchecked_sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """a - b + z*msg*delta with z chosen so the result stays positive
        (server_key/sub.rs correcting-term trick)."""
        p = self.params
        msg = p.message_modulus
        z = (b.degree + msg) // msg * msg  # multiple of msg, > b.degree
        corr = np.uint64((z * p.delta) % (1 << p.bits))
        data = self._add_to_body(a.data - b.data, corr)
        return a.with_data(data, degree=a.degree + z,
                           noise_level=a.noise_level + b.noise_level)

    def unchecked_neg(self, a: Ciphertext) -> Ciphertext:
        p = self.params
        msg = p.message_modulus
        z = (a.degree + msg) // msg * msg
        corr = np.uint64((z * p.delta) % (1 << p.bits))
        if isinstance(a.data, LazyLweData):
            neg = -a.data
        else:
            neg = np.zeros_like(np.asarray(a.data)) - np.asarray(a.data)
        data = self._add_to_body(neg, corr)
        return a.with_data(data, degree=z, noise_level=a.noise_level)

    def unchecked_scalar_add(self, a: Ciphertext, scalar: int) -> Ciphertext:
        p = self.params
        shift = np.uint64((scalar * p.delta) % (1 << p.bits))
        data = self._add_to_body(a.data if isinstance(a.data, LazyLweData)
                                 else np.asarray(a.data), shift)
        return a.with_data(data, degree=a.degree + scalar)

    def unchecked_scalar_mul(self, a: Ciphertext, scalar: int) -> Ciphertext:
        return a.with_data(a.data * np.uint64(scalar),
                           degree=a.degree * scalar,
                           noise_level=a.noise_level * scalar)

    def create_trivial(self, value: int) -> Ciphertext:
        p = self.params
        data = np.zeros(p.big_lwe_dimension + 1, dtype=np.uint64)
        v = value % p.total_modulus
        data[-1] = np.uint64((v * p.delta) % (1 << p.bits))
        return Ciphertext(data, degree=v, noise_level=0,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus)

    # ------------------------------------------------------------------
    # PBS-backed ops
    # ------------------------------------------------------------------

    def message_extract(self, a: Ciphertext) -> Ciphertext:
        return self.apply_lookup_table(a, self.generate_msg_lookup_table(lambda x: x))

    def carry_extract(self, a: Ciphertext) -> Ciphertext:
        p = self.params
        return self.apply_lookup_table(
            a, self.generate_lookup_table(lambda x: x // p.message_modulus))

    def _fits(self, degree: int, noise: int) -> bool:
        return degree <= self.max_degree and noise <= self.max_noise_level

    # ------------------------------------------------------------------
    # checked_* flavor (server_key/add.rs:131 CheckError convention): error
    # out when the operation would overflow the degree/noise budget, never
    # bootstrap implicitly.  Completes the four-flavor convention
    # unchecked_/checked_/smart_/default.
    # ------------------------------------------------------------------

    def _check(self, degree: int, noise: int) -> None:
        if not self._fits(degree, noise):
            raise CarryFullError(
                f"operation would exceed the budget: degree {degree} > "
                f"{self.max_degree} or noise {noise} > {self.max_noise_level}")

    def checked_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self._check(a.degree + b.degree, a.noise_level + b.noise_level)
        return self.unchecked_add(a, b)

    def checked_sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        p = self.params
        z = (b.degree + p.message_modulus) // p.message_modulus * p.message_modulus
        self._check(a.degree + z, a.noise_level + b.noise_level)
        return self.unchecked_sub(a, b)

    def checked_neg(self, a: Ciphertext) -> Ciphertext:
        p = self.params
        z = (a.degree + p.message_modulus) // p.message_modulus * p.message_modulus
        self._check(z, a.noise_level)
        return self.unchecked_neg(a)

    def checked_scalar_add(self, a: Ciphertext, scalar: int) -> Ciphertext:
        self._check(a.degree + scalar, a.noise_level)
        return self.unchecked_scalar_add(a, scalar)

    def checked_scalar_mul(self, a: Ciphertext, scalar: int) -> Ciphertext:
        self._check(a.degree * scalar, a.noise_level * scalar)
        return self.unchecked_scalar_mul(a, scalar)

    def checked_apply_bivariate(self, a: Ciphertext, b: Ciphertext, f) -> Ciphertext:
        p = self.params
        msg = p.message_modulus
        if b.degree >= msg:
            raise CarryFullError(f"rhs degree {b.degree} >= {msg} cannot pack")
        self._check(a.degree * msg + b.degree, a.noise_level * msg + b.noise_level)
        return self.unchecked_apply_bivariate(a, b, f)

    def checked_mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        p = self.params
        return self.checked_apply_bivariate(
            a, b, lambda x, y: (x * y) % p.message_modulus)

    def smart_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        if not self._fits(a.degree + b.degree, a.noise_level + b.noise_level):
            a = self.message_extract(a)
            b = self.message_extract(b)
        return self.unchecked_add(a, b)

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Default flavor: clean-carry output (message part only)."""
        return self.message_extract(self.smart_add(a, b))

    def unchecked_apply_bivariate(self, a: Ciphertext, b: Ciphertext, f) -> Ciphertext:
        """packed = a*msg + b, then LUT(f) — requires b.degree < msg."""
        p = self.params
        packed = self.unchecked_add(self.unchecked_scalar_mul(a, p.message_modulus), b)
        return self.apply_lookup_table(packed, self.generate_lookup_table_bivariate(f))

    def smart_apply_bivariate(self, a: Ciphertext, b: Ciphertext, f) -> Ciphertext:
        p = self.params
        msg = p.message_modulus
        deg = a.degree * msg + b.degree
        noise = a.noise_level * msg + b.noise_level
        if b.degree >= msg or not self._fits(deg, noise):
            a = self.message_extract(a)
            b = self.message_extract(b)
        return self.unchecked_apply_bivariate(a, b, f)

    def mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        p = self.params
        return self.smart_apply_bivariate(a, b, lambda x, y: (x * y) % p.message_modulus)

    def bitand(self, a, b):
        return self.smart_apply_bivariate(a, b, lambda x, y: x & y)

    def bitor(self, a, b):
        return self.smart_apply_bivariate(a, b, lambda x, y: x | y)

    def bitxor(self, a, b):
        return self.smart_apply_bivariate(a, b, lambda x, y: x ^ y)

    def eq(self, a, b):
        return self.smart_apply_bivariate(a, b, lambda x, y: int(x == y))

    def lt(self, a, b):
        return self.smart_apply_bivariate(a, b, lambda x, y: int(x < y))
