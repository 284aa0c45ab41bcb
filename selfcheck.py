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
        mine = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        mrows, mcols = mine.fetchall(), [d[0] for d in mine.description]
        oc = con.execute(sql)
        orows, ocols = oc.fetchall(), [d[0] for d in oc.description]
    except Exception as e:
        print(f"FAIL {name}: error {e}"); fail += 1; continue
    if sorted(mcols) != sorted(ocols):
        print(f"FAIL {name}: cols {sorted(mcols)} vs {sorted(ocols)}"); fail += 1; continue
    # The driver's hash is type-sensitive (e.g. DuckDB SUM(BIGINT)->HUGEINT
    # lands as object/float through pandas); mirror that by comparing the
    # DuckDB-reported column types, not just the values' str() forms.
    mtypes = {d[0]: str(d[1]) for d in mine.description}
    otypes = {d[0]: str(d[1]) for d in oc.description}
    tbad = [(c, mtypes[c], otypes[c]) for c in sorted(mcols)
            if mtypes[c] != otypes[c]]
    if tbad:
        print(f"FAIL {name}: dtypes {tbad}"); fail += 1; continue
    if len(mrows) != len(orows):
        print(f"FAIL {name}: rows {len(mrows)} vs {len(orows)}"); fail += 1; continue
    mi = [mcols.index(c) for c in sorted(mcols)]
    oi = [ocols.index(c) for c in sorted(ocols)]
    bad = None
    for r, (mr, orow) in enumerate(zip(mrows, orows)):
        mv = [norm(mr[i]) for i in mi]
        ov = [norm(orow[i]) for i in oi]
        if mv != ov:
            bad = (r, mv, ov); break
    if bad:
        print(f"FAIL {name}: row {bad[0]}: {bad[1]} vs {bad[2]}"); fail += 1
    else:
        print(f"ok   {name}: {len(mrows)} rows")
print(f"{'ALL GREEN' if fail == 0 else str(fail) + ' FAILURES'} "
      f"({len([n for n in oracles if not only or n in only])} checked)")
sys.exit(1 if fail else 0)
