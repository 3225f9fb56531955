#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs
each oracle through DuckDB against the same sf tables, and compares:
row count, schema (column names), and exact values after sorting columns
by name. Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals/floats to float64 where possible
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name, got: pd.DataFrame, want: pd.DataFrame):
    got, want = norm(got), norm(want)
    if list(got.columns) != list(want.columns):
        return f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
    for c in got.columns:
        if str(got[c].dtype) != str(want[c].dtype):
            return f"DTYPE col={c} got={got[c].dtype} want={want[c].dtype}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    # driver hashes values; emulate exact-compare after row sort
    gs = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns), kind="mergesort").reset_index(drop=True)
    for c in got.columns:
        gv, wv = gs[c].tolist(), ws[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not values_equal(a, b):
                return f"VALUE col={c} row={i} got={a!r} want={b!r}"
    return None


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
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        err = compare(name, got, want)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
