"""Profile pke_v2 verify at D=2048/k=64 (VERDICT r4 task 8: <150 ms)."""
import cProfile, io, pstats, sys, time
sys.path.insert(0, "/root/repo")
sys.argv = ["run.py", "--suite", "zk", "--params", "prod"]
import benches.run as br

# reuse the bench's setup by calling bench_zk with a profiling monkeypatch
from tfhe_tpu.zk import pke_v2
orig_verify = pke_v2.verify
prof = cProfile.Profile()
state = {}

def patched(proof, pp, pc, metadata=b""):
    t0 = time.time()
    prof.enable()
    ok = orig_verify(proof, pp, pc, metadata)
    prof.disable()
    state["dt"] = time.time() - t0
    return ok

pke_v2.verify = patched
br.bench_zk("prod", 1)
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(25)
print(s.getvalue())
