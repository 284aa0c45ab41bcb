#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 selfcheck.py [sfdir] [outdir] [query ...]
Reads outdir/<name>/ parquet dumps (written by graft.Verify) and
outdir/oracle_sql.json, runs each oracle in DuckDB against views named after
the sf tables, and compares: column names (sorted), row count, and values
row-by-row in produced order.
"""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.6g}"
    return str(v)

fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only: continue
    try:
        mdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: error {e}"); fail += 1; continue
    mcols, ocols = list(mdf.columns), list(odf.columns)
    if sorted(mcols) != sorted(ocols):
        print(f"FAIL {name}: cols {sorted(mcols)} vs {sorted(ocols)}"); fail += 1; continue
    # The driver's hash is PANDAS-dtype-sensitive (e.g. DuckDB
    # SUM(BIGINT)->HUGEINT lands as float64/object through .df() while the
    # Spark parquet side is int64); DuckDB's description types are too
    # coarse to see that ('NUMBER'=='NUMBER'), so compare the .df() dtypes
    # exactly as the driver's hash will see them.
    mtypes = {c: str(mdf[c].dtype) for c in mcols}
    otypes = {c: str(odf[c].dtype) for c in ocols}
    tbad = [(c, mtypes[c], otypes[c]) for c in sorted(mcols)
            if mtypes[c] != otypes[c]]
    if tbad:
        print(f"FAIL {name}: dtypes {tbad}"); fail += 1; continue
    if len(mdf) != len(odf):
        print(f"FAIL {name}: rows {len(mdf)} vs {len(odf)}"); fail += 1; continue
    scols = sorted(mcols)
    mrows = mdf[scols].itertuples(index=False, name=None)
    orows = odf[scols].itertuples(index=False, name=None)
    bad = None
    for r, (mr, orow) in enumerate(zip(mrows, orows)):
        mv = [norm(v) for v in mr]
        ov = [norm(v) for v in orow]
        if mv != ov:
            bad = (r, mv, ov); break
    if bad:
        print(f"FAIL {name}: row {bad[0]}: {bad[1]} vs {bad[2]}"); fail += 1
    else:
        print(f"ok   {name}: {len(mdf)} rows")
print(f"{'ALL GREEN' if fail == 0 else str(fail) + ' FAILURES'} "
      f"({len([n for n in oracles if not only or n in only])} checked)")
sys.exit(1 if fail else 0)
