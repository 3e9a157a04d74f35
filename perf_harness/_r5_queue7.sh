#!/bin/bash
cd /root/repo
while ! grep -q "queue6 done" perf_harness/_r5_queue6.log 2>/dev/null; do sleep 30; done
echo "=== bench.py prewarm (driver defaults; v7 pipeline) ==="
timeout 3600 python bench.py 2>&1 | tail -4
echo "=== bench.py second run (cache-warm check) ==="
timeout 1200 python bench.py 2>&1 | tail -4
echo "=== fheuint64 add profile v2 (instrumented rounds) ==="
timeout 3600 python perf_harness/_t_add_profile.py 2>&1 | grep -a "add e2e\|mean\|B=32\|compile" | tail -12
echo "=== queue7 done ==="
