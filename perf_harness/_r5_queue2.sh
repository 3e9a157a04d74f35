#!/bin/bash
# Waits for the ablation sweep, then runs the next hardware measurements.
cd /root/repo
while ! grep -q "abl done" perf_harness/_v9g_abl.log 2>/dev/null; do sleep 20; done
echo "=== t_lanes full ==="
TL=1 timeout 2400 python perf_harness/_t_v9g_run.py 2>&1 | grep -a "BR/s\|compile+first\|middle\|rror" | tail -4
echo "=== tb=256 attempt ==="
TL=1 TB=256 timeout 2400 python perf_harness/_t_v9g_run.py 2>&1 | grep -a "BR/s\|compile+first\|rror\|RESOURCE\|vmem" | tail -4
echo "=== queue2 done ==="
