#!/usr/bin/env python
"""Benchmark: KS+PBS throughput at shortint 2_2 parameters on real hardware.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: 10,000 PBS/s per chip (BASELINE.md north star; reference points:
~880 KS+MB-PBS/s on one H100 single-stream, 14.2k PBS/s on the V80 FPGA).

Env overrides: TFHE_TPU_BENCH_BATCH (default 128),
TFHE_TPU_BENCH_PARAMS=test|prod (default prod = v1_4 2_2 TUniform 2M128).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from tfhe_tpu.shortint import (
        TEST_PARAM_MESSAGE_2_CARRY_2,
        V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
    )
    from tfhe_tpu.utils.keycache import get_shortint_keys

    which = os.environ.get("TFHE_TPU_BENCH_PARAMS", "prod")
    params = (V1_4_PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
              if which == "prod" else TEST_PARAM_MESSAGE_2_CARRY_2)
    batch = int(os.environ.get("TFHE_TPU_BENCH_BATCH", "256"))

    t0 = time.time()
    ck, sk = get_shortint_keys(params)
    print(f"# keygen/load: {time.time()-t0:.1f}s", file=sys.stderr)

    cts = [ck.encrypt(i % 4) for i in range(batch)]
    lut = sk.generate_lookup_table(lambda x: (x * 3 + 1) % 16)

    # warm-up / compile
    t0 = time.time()
    sk.apply_lookup_table_batch(cts, lut)
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # steady state
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = sk.apply_lookup_table_batch(cts, lut)
    dt = time.time() - t0
    pbs_per_s = batch * iters / dt

    # correctness spot check
    dec = ck.decrypt_raw(out[5])
    assert dec == (5 % 4 * 3 + 1) % 16, f"wrong PBS result: {dec}"

    print(json.dumps({
        "metric": "ks_pbs_throughput_2_2",
        "value": round(pbs_per_s, 2),
        "unit": "PBS/s per chip",
        "vs_baseline": round(pbs_per_s / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
