#!/bin/bash
# After queue5: compression re-run at ss=2 (the ss=4 body OOM-kills the
# Mosaic compile helper), then the full sweep (all kernels now cached),
# then one long fused-squash attempt.
cd /root/repo
while ! grep -q "queue5 done" perf_harness/_r5_queue5.log 2>/dev/null; do sleep 30; done
echo "=== compression bench ss=2 (VERDICT #7) ==="
timeout 5400 python benches/run.py --suite compression --params prod 2>&1 | grep -a '"metric"\|error\|total' | tail -8
echo "=== full sweep (VERDICT #3) ==="
bash perf_harness/_r5_sweep.sh
tail -30 perf_harness/_benches_r5.txt
echo "=== queue6 done ==="
