#!/bin/bash
# Round-4 COMPLETE hardware sweep (VERDICT r3 task 6): every suite, one log.
# Serialized; each suite under its own timeout so one failure doesn't
# silence the rest.  zk runs CPU-side (pairing crypto is host work).
cd /root/repo
LOG=perf_harness/_benches_r4.txt
: > "$LOG"
for s in ks ks_pbs multibit pbs128 compression integer integer_throughput sizes; do
  echo "=== suite $s ===" | tee -a "$LOG"
  timeout 5400 python benches/run.py --suite "$s" --params prod >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
done
echo "=== suite zk (host) ===" | tee -a "$LOG"
JAX_PLATFORMS=cpu timeout 5400 python benches/run.py --suite zk --params prod >> "$LOG" 2>&1
echo "--- exit=$? ---" >> "$LOG"
echo "=== sweep done ===" | tee -a "$LOG"
