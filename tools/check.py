#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL in DuckDB over the same parquet tables, loads the
Spark result parquet written by graft.Verify, and compares exactly
(columns sorted by name, rows sorted by all columns, values equal).

Usage:
  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 target/verify_out'
  python3 tools/check.py /root/testdata/sf0.01 target/verify_out
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", v)
    if isinstance(v, (int,)):
        return ("num", float(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.tz_localize(None) if v.tzinfo else v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("arr", tuple(norm(x) for x in v))
    return (type(v).__name__, v)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(df.columns), sorted(rows, key=repr)

fails = 0
for name in sorted(oracle):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sdf = pq.read_table(spark_path).to_pandas()
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
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

# queries without an oracle: rows-only check
for d in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, d)
    if os.path.isdir(p) and d not in oracle:
        n = pq.read_table(p).num_rows
        print(("OK  " if n > 0 else "FAIL") + f" {d}: rows-only {n}")
        fails += 0 if n > 0 else 1

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
