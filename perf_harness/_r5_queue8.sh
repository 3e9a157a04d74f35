#!/bin/bash
cd /root/repo
while ! grep -q "queue7 done" perf_harness/_r5_queue7.log 2>/dev/null; do sleep 30; done
echo "=== multibit product-path breakdown ==="
timeout 3600 python perf_harness/_t_prod_mb_probe.py 2>&1 | grep -a "use_mxu\|ensure\|warm\|steady" | tail -10
echo "=== queue8 done ==="
