#!/bin/bash
cd /root/repo
echo "=== v9 g2 ss=2 tb=128 (fixed middle build) ==="
SS=2 TB=128 B=512 timeout 5400 python perf_harness/_t_v9_run.py
echo "=== v9 g2 ss=2 tb=256 ==="
SS=2 TB=256 B=512 timeout 5400 python perf_harness/_t_v9_run.py
echo "=== queue2 done ==="
