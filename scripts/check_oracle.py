#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with every
testdata table registered as a view, and compares: schema (column
names), row count, and exact values after sorting columns by name and
rows by all columns. Reports per-query PASS/FAIL plus near-miss info
(max abs diff) for float columns so FP risk is visible before the real
driver runs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(float(v) if isinstance(v, (int, float)) and isinstance(v, float)
                         else v for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got_rel.columns)
            got = norm(con.sql(
                f"SELECT {', '.join(got_cols)} FROM '{out_dir}/{name}/*.parquet'").fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = norm(con.sql(
                f"SELECT {', '.join(exp_cols)} FROM ({sql})").fetchall())
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = 0
        maxdiff = 0.0
        first = None
        for g, e in zip(got, exp):
            if g != e:
                ok = True
                for gv, ev in zip(g, e):
                    if gv == ev:
                        continue
                    if isinstance(gv, float) and isinstance(ev, float):
                        if math.isnan(gv) and math.isnan(ev):
                            continue
                        maxdiff = max(maxdiff, abs(gv - ev))
                        ok = False
                    else:
                        ok = False
                if not ok:
                    bad += 1
                    if first is None:
                        first = (g, e)
        if bad:
            print(f"FAIL {name}: {bad}/{len(got)} rows differ, max float diff {maxdiff}")
            print(f"     got {first[0]}\n     exp {first[1]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
