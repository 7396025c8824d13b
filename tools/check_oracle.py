#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir under verify_out_dir, runs oracle_sql.json[name]
in DuckDB against the sf_dir tables and compares:
  - column sets (sorted by name),
  - row counts,
  - cell values (rows sorted), exact for non-floats, exact-or-reported-diff for floats.

Dev tooling only — the shipped Scala library has no Python dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(outdir: str, sfdir: str) -> int:
    out = Path(outdir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            print(f"PASS  {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


def compare(got, exp):
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        return False, f"columns differ: spark={gcols} duckdb={ecols}"
    if len(got) != len(exp):
        return False, f"row count: spark={len(got)} duckdb={len(exp)}"
    g = got[gcols].sort_values(gcols, ignore_index=True)
    e = exp[ecols].sort_values(ecols, ignore_index=True)
    for c in gcols:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return False, (f"float mismatch col={c} row={i}: "
                                   f"spark={a!r} duckdb={b!r} diff={a-b!r}")
            else:
                if str(a) != str(b):
                    return False, (f"mismatch col={c} row={i}: "
                                   f"spark={a!r} duckdb={b!r}")
    return True, ""


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
