#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each
Verify-dumped parquet result against the DuckDB oracle SQL.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

pd.set_option("display.width", 240)
pd.set_option("display.max_columns", 50)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        # exact value compare (tighter than the driver's hash)
        neq = None
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                bad = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                bad = pd.Series([True] * len(a))
            if bad.any():
                neq = (c, int(bad.sum()), g[bad].head(3), x[bad].head(3))
                break
        if neq:
            c, n, gh, xh = neq
            print(f"FAIL {name}: col {c} differs in {n} rows")
            print("  spark:", gh.to_dict("records"))
            print("  duck :", xh.to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
