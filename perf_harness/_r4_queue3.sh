#!/bin/bash
cd /root/repo
echo "=== v9 g2 ss=2 tb=128 (collapsed stores) ==="
SS=2 TB=128 B=512 timeout 9000 python perf_harness/_t_v9_run.py
echo "=== v8 ss=2 tb=256 (collapsed stores) ==="
K=v8 SS=2 TB=256 B=512 timeout 9000 python perf_harness/_t_v8_run.py
echo "=== queue3 done ==="
