#!/bin/bash
# One-shot hardware measurement sequence for the round-2 kernels.
# Run from repo root when the tunnel is up:  bash perf_harness/hw_session.sh
# Each stage appends to perf_harness/hw_session.log; safe to re-run (compile
# cache persists).  Order: cheapest-compile first, best-guess configs only.
set -x
LOG=perf_harness/hw_session.log
date >> $LOG

# 0. sanity: device visible
timeout 300 python -c "import jax; print(jax.devices())" >> $LOG 2>&1 || exit 1

# 1. v3 at 3 primes (kernel already compiled for 4p; 3p is a new shape)
V3_PRIMES=3 V3_FOLD=solinas timeout 3000 python perf_harness/_t_v3_run.py 64 128 >> $LOG 2>&1

# 2. v4 at 3 primes, tb=64 (relayout effect at equal tile)
V4_PRIMES=3 timeout 3000 python perf_harness/_t_v4_run.py 64 128 >> $LOG 2>&1

# 3. v4 at 3 primes, tb=128 (VMEM fit from the packed layout)
V4_PRIMES=3 timeout 3000 python perf_harness/_t_v4_run.py 128 128 >> $LOG 2>&1

# 4. v5 at 3 primes, tb=64 (byte-limb interfaces)
V5_PRIMES=3 timeout 3600 python perf_harness/_t_v5_run.py 64 128 >> $LOG 2>&1

# 5. v5 tb=128
V5_PRIMES=3 timeout 3600 python perf_harness/_t_v5_run.py 128 128 >> $LOG 2>&1

tail -40 $LOG
