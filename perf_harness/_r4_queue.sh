#!/bin/bash
# serialized round-4 hardware measurements (one TPU; never overlap)
cd /root/repo
echo "=== v8 ss=2 tb=256 ==="
K=v8 SS=2 TB=256 B=512 timeout 5400 python perf_harness/_t_v8_run.py
echo "=== v9 g2 ss=2 tb=128 ==="
SS=2 TB=128 B=512 timeout 5400 python perf_harness/_t_v9_run.py
echo "=== v9 g2 ss=2 tb=256 ==="
SS=2 TB=256 B=512 timeout 5400 python perf_harness/_t_v9_run.py
echo "=== queue done ==="
