#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
against DuckDB executing oracle_sql.json over the same parquet tables.
Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values (lists -> tuples) so DataFrame compare works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              str(type(v)).endswith("ndarray'>") else v)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        try:
            mine = pd.read_parquet(qdir)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only: {len(mine)} rows" + (" EMPTY!" if len(mine) == 0 else "")
            continue
        try:
            ref = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {type(e).__name__}: {e}"
            continue
        a, b = norm(mine), norm(ref)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH mine={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH mine={len(a)} oracle={len(b)}"
        else:
            diffs = []
            for c in a.columns:
                av, bv = a[c], b[c]
                try:
                    # float columns: tiny relative tolerance so a DuckDB
                    # version changing its summation order (FMA, pairwise)
                    # can't spuriously fail an otherwise-exact pass; ints and
                    # strings stay exact-equality
                    if av.dtype.kind == "f" and bv.dtype.kind == "f":
                        eq = pd.Series(np.isclose(av, bv, rtol=1e-12, atol=0.0,
                                                  equal_nan=True), index=av.index)
                    else:
                        eq = (av == bv) | (av.isna() & bv.isna())
                except Exception:
                    eq = av.astype(str) == bv.astype(str)
                if not eq.all():
                    idx = (~eq).idxmax()
                    diffs.append(f"{c}@{idx}: {av[idx]!r} vs {bv[idx]!r} ({int((~eq).sum())} cells)")
            results[name] = "MATCH" if not diffs else "VALUE-MISMATCH " + "; ".join(diffs[:3])
    width = max(len(k) for k in results)
    n_ok = 0
    for k in sorted(results):
        ok = results[k] == "MATCH" or results[k].startswith("rows-only")
        n_ok += ok
        print(f"{'PASS' if ok else 'FAIL'} {k:<{width}} {results[k]}")
    print(f"{n_ok}/{len(results)} ok")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
