#!/bin/bash
# After queue2: the VERDICT measurement checklist.
cd /root/repo
while ! grep -q "queue2 done" perf_harness/_r5_queue2.log 2>/dev/null; do sleep 20; done
echo "=== pbs128 squash bench (VERDICT #5) ==="
timeout 5400 python benches/run.py --suite pbs128 --params prod 2>&1 | tail -6
echo "=== compression bench (VERDICT #7) ==="
timeout 5400 python benches/run.py --suite compression --params prod 2>&1 | tail -8
echo "=== fheuint64 add profile (VERDICT #4) ==="
timeout 3600 python perf_harness/_t_add_profile.py 2>&1 | grep -a "add e2e\|mean\|B=32\|compile" | tail -10
echo "=== queue3 done ==="
