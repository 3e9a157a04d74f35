#!/bin/bash
# After queue3: the headline lever — v8 classic (deferred s1 asm + REDC
# inverse) with ss=1 (small Mosaic program, the r4 blocker was ss>=2
# program size).  tb=256 first; tb=128 fallback if VMEM rejects.
cd /root/repo
while ! grep -q "queue3 done" perf_harness/_r5_queue3.log 2>/dev/null; do sleep 30; done
echo "=== v8 ss=1 tb=256 ==="
K=v8 SS=1 TB=256 B=512 timeout 3600 python perf_harness/_t_v8_run.py 2>&1 | grep -a "middle\|compile\|BR/s\|rror\|vmem\|RESOURCE" | tail -5
echo "=== v8 ss=1 tb=128 ==="
K=v8 SS=1 TB=128 B=512 timeout 3600 python perf_harness/_t_v8_run.py 2>&1 | grep -a "middle\|compile\|BR/s\|rror\|vmem\|RESOURCE" | tail -5
echo "=== queue4 done ==="
