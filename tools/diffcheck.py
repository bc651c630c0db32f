#!/usr/bin/env python3
"""Local differential check: Verify output vs DuckDB oracle.

Mimics the driver's compare: load our parquet result and the oracle SQL
result, sort columns by name, sort rows, compare values. Usage:

    python3 tools/diffcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            fails.append(name)
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            continue
        g, e = norm(got), norm(exp)
        if len(g) != len(e):
            fails.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            continue
        eq = g.equals(e)
        if not eq:
            # tolerate dtype-only differences by comparing as strings
            eq = g.astype(str).equals(e.astype(str))
        if not eq:
            fails.append(name)
            print(f"FAIL {name}: value mismatch")
            diff = (g.astype(str) != e.astype(str))
            rows = diff.any(axis=1)
            print("  got:", g[rows].head(3).to_string())
            print("  exp:", e[rows].head(3).to_string())
        else:
            print(f"ok   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
