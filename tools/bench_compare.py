#!/usr/bin/env python3
"""Cross-round bench comparison in CALIBRATED terms.

Usage: bench_compare.py OLD_BENCH.json NEW_BENCH.json

Raw per-query ratios conflate host weather with plan changes (r7->r8: a
uniform 1.78x on unchanged code). When both files carry a `calibration`
block (r9+), queries are compared through `queries_norm` (seconds divided
by that session's canonical-Spark-probe median); otherwise the raw ratio
is reported with a loud caveat. Prints the median ratio, the spread, and
the per-query tails."""
import json, sys, statistics

def load(p):
    with open(p) as f:
        return json.load(f)

def norm_queries(d):
    if "queries_norm" in d:
        q = {k: v for k, v in d["queries_norm"].items() if v > 0}
        if q:  # all-(-1) queries_norm (failed probe) falls through to raw
            return q, True
    probe = d.get("calibration", {}).get("spark_probe_sec", -1)
    if probe and probe > 0:
        return {k: v / probe for k, v in d["queries"].items() if v > 0}, True
    return {k: v for k, v in d["queries"].items() if v > 0}, False

def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, o_cal = norm_queries(old)
    nq, n_cal = norm_queries(new)
    calibrated = o_cal and n_cal
    if not calibrated:
        # never mix a normalized side with a raw side - fall back to raw
        # seconds for BOTH files
        oq = {k: v for k, v in old["queries"].items() if v > 0}
        nq = {k: v for k, v in new["queries"].items() if v > 0}
    shared = sorted(set(oq) & set(nq))
    if not shared:
        print("no shared queries"); return
    ratios = {k: nq[k] / oq[k] for k in shared if oq[k] > 0}
    med = statistics.median(ratios.values())
    mode = "CALIBRATED (normalized by each session's spark probe)" if calibrated \
        else "RAW (>=1 file lacks calibration; host drift NOT removed)"
    print(f"mode: {mode}")
    for f, d in (("old", old), ("new", new)):
        c = d.get("calibration")
        if c:
            print(f"{f}: spark_probe={c['spark_probe_sec']}s cpu_probe="
                  f"{c['cpu_probe_sec_before']}/{c['cpu_probe_sec_after']}s "
                  f"loadavg={c['loadavg_before']}->{c['loadavg_after']}")
    if len(ratios) >= 2:
        qs = statistics.quantiles(list(ratios.values()), n=10)
        print(f"shared queries: {len(shared)}  median ratio: {med:.3f}  "
              f"p10/p90: {qs[0]:.3f}/{qs[8]:.3f}")
    else:  # quantiles() raises below 2 data points
        print(f"shared queries: {len(shared)}  median ratio: {med:.3f}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:8]
    print("slowest-moving (new/old):")
    for k, r in worst: print(f"  {r:6.2f}x  {k}")
    print("fastest-moving (new/old):")
    for k, r in best: print(f"  {r:6.2f}x  {k}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
