#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB over the same tables,
sort columns by name + rows by all columns, and compare values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os
    # Large-replica sweeps: a quadratic oracle (all-pairs edges feeding a
    # recursive CTE) can balloon past physical RAM — one sf1 run was
    # OOM-killed at 83 GB RSS. A memory cap + spill dir turns that into
    # either a spilled (slow but correct) run or a loud per-query DuckDB
    # error instead of a dead process.
    mem = os.environ.get("DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{out_dir}/_duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written replica dirs vs plain files
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)" if len(got) > 0 else "EMPTY!"
            print(f"{'PASS' if len(got) else 'FAIL'} {name}: {status}")
            n_pass += 1 if len(got) else 0
            n_fail += 0 if len(got) else 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex).splitlines()[-1]}")
            diff = (g != e) & ~(g.isna() & e.isna())
            bad = diff.any(axis=1)
            print(g[bad].head(3))
            print(e[bad].head(3))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
