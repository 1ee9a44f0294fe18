#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICTER.

Runs each oracle SQL in DuckDB over the same parquet tables, loads the
Spark result parquet written by graft.Verify, and compares (columns
sorted by name, rows sorted, cells compared as (type-name, str(value))).

The cell comparison is deliberately the strictest reasonable form: the
driver hashes the string form of each cell, so Decimal('4.50') vs
float 4.5 — equal numerically — must FAIL here (round 1 shipped nine
such mismatches because this script normalized Decimal→float). Array
columns fail outright: the driver sorts rows with pandas and numpy
arrays are unhashable there.

Usage:
  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 target/verify_out'
  python3 tools/check.py /root/testdata/sf0.01 target/verify_out
"""
import sys, os, json, glob

import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple((type(v).__name__, str(v)) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(df.columns), sorted(rows, key=repr)

fails = 0
names = sorted(set(oracle) | {d for d in os.listdir(out_dir)
                              if os.path.isdir(os.path.join(out_dir, d))})
for name in names:
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sdf = pq.read_table(spark_path).to_pandas()
    except Exception as e:
        print(f"FAIL {name}: unreadable spark output: {e}"); fails += 1; continue
    arr_cols = [c for c in sdf.columns
                if sdf[c].dtype == object and len(sdf)
                and type(sdf[c].iloc[0]).__name__ == "ndarray"]
    if arr_cols:
        print(f"FAIL {name}: array column(s) {arr_cols} (driver cannot sort them)")
        fails += 1
        continue
    if name not in oracle:
        n = len(sdf)
        print(("OK  " if n > 0 else "FAIL") + f" {name}: rows-only {n}")
        fails += 0 if n > 0 else 1
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    scols, srows = canon(sdf)
    ocols, orows = canon(odf)
    if list(scols) != list(ocols):
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(srows, orows) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(srows)} rows")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
