#!/bin/bash
# Round-5 COMPLETE hardware sweep (VERDICT r4 next-#3): every suite, one
# log, then the regression gate vs the round-3 partial sweep.
cd /root/repo
LOG=perf_harness/_benches_r5.txt
: > "$LOG"
for s in ks ks_pbs multibit compression integer integer_throughput sizes; do
  echo "=== suite $s ===" | tee -a "$LOG"
  timeout 5400 python benches/run.py --suite "$s" --params prod >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
done
# pbs128 rides the XLA path: the fused v2q kernel's Mosaic program does
# not compile on this host's compile service (>90 min, like unrolled v9)
echo "=== suite pbs128 (XLA path) ===" | tee -a "$LOG"
TFHE_TPU_DISABLE_PALLAS=1 timeout 5400 python benches/run.py --suite pbs128 --params prod >> "$LOG" 2>&1
echo "--- exit=$? ---" >> "$LOG" 
echo "=== suite zk (host) ===" | tee -a "$LOG"
JAX_PLATFORMS=cpu timeout 5400 python benches/run.py --suite zk --params prod >> "$LOG" 2>&1
echo "--- exit=$? ---" >> "$LOG"
echo "=== regression gate vs r3 ===" | tee -a "$LOG"
python benches/regress.py perf_harness/_benches_r3.txt "$LOG" >> "$LOG" 2>&1
echo "--- gate exit=$? ---" >> "$LOG"
echo "=== sweep done ===" | tee -a "$LOG"
