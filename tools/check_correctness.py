#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
written by `graft.Verify <sfDir> <outDir>`, run the matching oracle SQL in
DuckDB over the same parquet tables and compare row multisets (columns
sorted by name). Usage: check_correctness.py <outDir> <sfDir>."""
import sys, os, json, glob, math
import duckdb, pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}".rstrip('0').rstrip('.'))
            elif isinstance(v, bool):
                row.append(str(bool(v)))
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = duckdb.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    if name not in oracles:
        print(f"  ~ {name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"  ✗ {name}: ORACLE ERROR {e}")
        fail += 1
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if a == b:
        print(f"  ✓ {name}: {len(a)} rows match")
        ok += 1
    else:
        fail += 1
        print(f"  ✗ {name}: MISMATCH spark={len(a)} oracle={len(b)}")
        sa, sb = set(a), set(b)
        for x in list(sa - sb)[:3]:
            print(f"      spark-only:  {x}")
        for x in list(sb - sa)[:3]:
            print(f"      oracle-only: {x}")
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
