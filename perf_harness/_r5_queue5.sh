#!/bin/bash
# After queue4: e2e product-path numbers for the bench decision.
cd /root/repo
while ! grep -q "queue4 done" perf_harness/_r5_queue4.log 2>/dev/null; do sleep 30; done
echo "=== e2e multibit g=2 (bench pipeline v9, product path) ==="
TFHE_TPU_BENCH_PIPELINE=v9 TFHE_TPU_BENCH_BATCH=512 timeout 3600 python bench.py 2>&1 | tail -4
echo "=== e2e classic v8 (bench pipeline v3 kernel v8) ==="
TFHE_TPU_BENCH_KERNEL=v8 TFHE_TPU_BENCH_BATCH=512 timeout 3600 python bench.py 2>&1 | tail -4
echo "=== queue5 done ==="
