#!/usr/bin/env python3
"""DuckDB wall-time anchor for the Spark bench (dev tool only).

The acceptance bound "within 2x of baseline at the same scale factor"
needs an independent engine number: this times each benched query's
ORACLE SQL in DuckDB on the same parquet tables and pairs it with the
Spark median from a bench JSON, emitting a spark-vs-duckdb ratio table.

Read the ratios with care — this is an ANCHOR, not a strict engine
shoot-out:
  - The oracle SQL is the REFERENCE ALGORITHM, which for the dedup/ANN
    families is deliberately the quadratic brute-force form the engine
    exists to avoid (the oracle proves values, not throughput); ratios
    for those queries overstate Spark.
  - DuckDB is a single-node vectorized OLAP engine with zero
    per-query planning/scheduling overhead; at sf0.1 (tens of MB) it
    SHOULD win most relational queries — that is the expected shape,
    and it inverts at scale because its single-box memory/CPU ceiling
    is the exact constraint the Spark plans are built to escape
    (documented per-query in README's ratio table).

Usage:
  python3 dev/bench_duckdb.py <sfDir> <verifyOutDir> <sparkBenchJson> [out.json]

<verifyOutDir> must hold oracle_sql.json from a graft.Verify run;
<sparkBenchJson> a graft.Bench output (its "queries" keys select what
is timed). Writes bench_duckdb.json (or [out.json]).
"""
import sys, os, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
PASSES = 3


def main():
    sf_dir, out_dir, bench_json = sys.argv[1], sys.argv[2], sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else "bench_duckdb.json"
    bench = json.load(open(bench_json))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            typ = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')")

    rows = {}
    for name, spark_s in sorted(bench["queries"].items()):
        sql = oracle.get(name)
        if sql is None:
            rows[name] = {"spark": spark_s, "duckdb": None, "ratio": None,
                          "note": "no SQL oracle (ScalaTest-evidenced query)"}
            continue
        try:
            times = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            d = statistics.median(times)
            rows[name] = {"spark": round(spark_s, 3), "duckdb": round(d, 3),
                          "ratio": round(spark_s / d, 2) if d > 0 else None}
        except Exception as e:
            rows[name] = {"spark": spark_s, "duckdb": None, "ratio": None,
                          "note": f"duckdb error: {e}"[:200]}

    timed = {k: v for k, v in rows.items() if v.get("duckdb") is not None}
    summary = {
        "sf": sf_dir,
        "passes": PASSES,
        "spark_total": round(sum(v["spark"] for v in timed.values()), 2),
        "duckdb_total": round(sum(v["duckdb"] for v in timed.values()), 2),
        "duckdb_wins": sum(1 for v in timed.values() if v["ratio"] and v["ratio"] > 1),
        "spark_wins": sum(1 for v in timed.values() if v["ratio"] and v["ratio"] <= 1),
        "queries": rows,
    }
    json.dump(summary, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: spark {summary['spark_total']}s vs duckdb "
          f"{summary['duckdb_total']}s over {len(timed)} queries "
          f"(duckdb wins {summary['duckdb_wins']}, spark wins {summary['spark_wins']})")


if __name__ == "__main__":
    main()
