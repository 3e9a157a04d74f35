#!/bin/bash
cd /root/repo
for abl in rot s1 mid; do
  echo "=== ABL=$abl ==="
  ABL=$abl timeout 2400 python perf_harness/_t_v9g_run.py 2>&1 | grep -a "BR/s\|compile+first\|rror" | tail -3
done
echo "=== abl done ==="
