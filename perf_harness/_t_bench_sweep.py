import os, time, sys, json
import numpy as np
for b in [256, 512]:
    os.environ["TFHE_TPU_BENCH_BATCH"] = str(b)
    import subprocess
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True, timeout=880)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(f"batch {b}: {line[0] if line else r.stderr[-200:]}", flush=True)
