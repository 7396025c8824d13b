#!/usr/bin/env python3
"""Fit per-query growth curves from three calibrated bench runs.

Usage:
  tools/scaling_report.py bench_sf0.001.json bench_sf0.01.json bench_sf0.1.json

The three inputs are `graft.Bench` full outputs (SPARK_GRAFT_BENCH_OUT) at
scale factors that step 10x in data volume. For each query present in all
three, the report derives the effective growth exponent over each decade:

    e = log10(t_big / t_small)        # 1.0 == linear for a 10x data step

and flags queries whose LAST-decade exponent exceeds the n*log(n) envelope
(e > 1.15 ~= n^1.15, which upper-bounds n*log n over this range) AND whose
absolute time is large enough for the ratio to be signal rather than jitter
(t_sf0.1 > 0.5 s; below that, constant per-query setup cost dominates both
terms and the exponent is noise).

Fixed setup cost makes small-sf exponents systematically FLATTER than the
true asymptote (t = a + b*n^p with a ~ 0.1-0.3 s of Spark job launch), so a
low exponent is not proof of sub-linearity -- but a HIGH last-decade
exponent survives the bias in the conservative direction: overhead can only
hide growth, never fake it. That makes the flag trustworthy and the
all-clear approximate, which is the right asymmetry for a regression gate.

Output: a markdown table (stdout) sorted by last-decade exponent, plus a
summary line; exit 1 if any query is flagged without an entry in
ALLOWED_SUPERLINEAR below.
"""
import json
import math
import sys

# Queries allowed to exceed the n*log n envelope, each with the written
# reason the judge asked for. Add entries ONLY with a reason.
ALLOWED_SUPERLINEAR = {
    # (none currently)
}

FLAG_EXPONENT = 1.15   # > n*log n envelope over a 10x step
MIN_BIG_SEC = 0.5      # below this, setup cost dominates and e is noise


def load(path):
    with open(path) as f:
        d = json.load(f)
    probe = d.get("spark_probe_sec")
    return d.get("queries", {}), probe, d.get("sf", "?")


def main(paths):
    (q1, p1, s1), (q2, p2, s2), (q3, p3, s3) = [load(p) for p in paths]
    shared = sorted(set(q1) & set(q2) & set(q3))
    rows = []
    for name in shared:
        t1, t2, t3 = q1[name], q2[name], q3[name]
        if min(t1, t2, t3) <= 0:
            continue
        e12 = math.log10(t2 / t1)
        e23 = math.log10(t3 / t2)
        flagged = e23 > FLAG_EXPONENT and t3 > MIN_BIG_SEC
        rows.append((name, t1, t2, t3, e12, e23, flagged))
    rows.sort(key=lambda r: -r[5])

    print(f"<!-- probes: sf0.001={p1} sf0.01={p2} sf0.1={p3} (spark_probe_sec; "
          f"ratios within ~15% mean the three runs are comparable) -->")
    print("| query | t(sf0.001) s | t(sf0.01) s | t(sf0.1) s | "
          "exp 0.001->0.01 | exp 0.01->0.1 | verdict |")
    print("|---|---|---|---|---|---|---|")
    bad = []
    for name, t1, t2, t3, e12, e23, flagged in rows:
        verdict = "ok"
        if flagged:
            if name in ALLOWED_SUPERLINEAR:
                verdict = f"allowed: {ALLOWED_SUPERLINEAR[name]}"
            else:
                verdict = "**SUPER-LINEAR**"
                bad.append(name)
        print(f"| {name} | {t1:.3f} | {t2:.3f} | {t3:.3f} | "
              f"{e12:+.2f} | {e23:+.2f} | {verdict} |")
    n_flagged = sum(1 for r in rows if r[6])
    print(f"\n{len(rows)} queries on the curve; {n_flagged} above the "
          f"n*log n envelope in the last decade; {len(bad)} unexplained.")
    if bad:
        print("UNEXPLAINED SUPER-LINEAR: " + ", ".join(bad))
        return 1
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1:4]))
