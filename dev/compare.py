#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run Verify.scala output (parquet per query) against DuckDB running
oracle_sql.json on the same test tables; sort columns by name, sort
rows, compare values exactly. Dev tool only — the engine never uses it.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table dir (e.g. ScaleUp output)
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            # Spark-written replicas store ts as BIGINT ns (Spark has no
            # nanos timestamp type); normalize to TIMESTAMP exactly like
            # TestTables.events does (integer-div truncation to us), so
            # the same oracles run against both physical schemas.
            typ = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}");  n_fail += 1;  continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        s, d = normalize(spark), normalize(duck)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}");  n_fail += 1;  continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}");  n_fail += 1;  continue
        diff_cols = []
        for c in s.columns:
            a, b = s[c], d[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                eq = (a.fillna(1.5e308) == b.fillna(1.5e308)) | ((a - b).abs() < 1e-30)
            else:
                eq = a.astype(str).fillna("\0") == b.astype(str).fillna("\0")
            if not eq.all():
                i = (~eq).idxmax()
                diff_cols.append(f"{c}[row{i}: {a[i]!r} vs {b[i]!r}]")
        if diff_cols:
            print(f"FAIL {name}: value diff in {diff_cols[:3]}");  n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)");  n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
