#!/usr/bin/env python3
"""Time the oracle SQL (the DuckDB-expressible subset of SparkEntry.queries)
in DuckDB against the same parquet tables, for a single-node throughput
comparison against BENCH numbers. Best-of-2 per query, all cores.
Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        times = []
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            except Exception as e:
                results[name] = None
                break
        if times:
            results[name] = min(times)
    total = sum(v for v in results.values() if v)
    qs = {k: (round(v, 4) if v else None) for k, v in results.items()}
    print(json.dumps({"engine": "duckdb", "value": round(total, 3),
                      "unit": "sec", "queries": qs, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
