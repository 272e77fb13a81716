#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<query>/ parquet dirs + oracle_sql.json. Runs each oracle SQL in
DuckDB (views named after the parquet tables), sorts columns by name,
sorts rows, and compares values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pq_dir = f"{out_dir}/{name}"
        try:
            files = glob.glob(f"{pq_dir}/*.parquet")
            if not files:
                results[name] = "MISSING-SPARK-OUTPUT"
                continue
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.sql(sql).df())
            if list(spark_df.columns) != list(duck_df.columns):
                results[name] = f"SCHEMA-MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
                continue
            if len(spark_df) != len(duck_df):
                results[name] = f"ROWCOUNT-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
                continue
            # exact value compare (mirrors driver hash compare)
            mismatch = None
            for c in spark_df.columns:
                a, b = spark_df[c].tolist(), duck_df[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y and not (pd.isna(x) and pd.isna(y))]
                if bad:
                    mismatch = (c, bad[:3])
                    break
            results[name] = "OK" if mismatch is None else f"VALUE-MISMATCH col={mismatch[0]} first={mismatch[1]}"
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
    # queries with no oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[name] = f"ROWS-ONLY rows={n}" + (" (EMPTY!)" if n == 0 else "")
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else 'FAIL' if not v.startswith('ROWS-ONLY') else 'INFO':4} {name}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle queries OK")
    sys.exit(0 if ok == len(oracle) else 1)

if __name__ == "__main__":
    main()
