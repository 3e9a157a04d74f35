#!/bin/bash
cd /root/repo
while ! grep -q "queue6 done" perf_harness/_r5_queue6.log 2>/dev/null; do sleep 30; done
echo "=== fheuint64 add profile v2 (instrumented rounds) ==="
timeout 3600 python perf_harness/_t_add_profile.py 2>&1 | grep -a "add e2e\|mean\|B=32\|compile" | tail -12
echo "=== queue7 done ==="
