#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness compare: run each oracle SQL
in DuckDB over the sf tables and diff against the Verify parquet dumps
(columns sorted by name, values compared with small float tolerance)."""
import sys, json, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e).splitlines()[0]}"))
        continue
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"columns differ: {list(exp.columns)} vs {list(got.columns)}"))
        continue
    if len(exp) != len(got):
        fails.append((name, f"row count {len(got)} vs expected {len(exp)}"))
        continue
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                ok = b is None or (isinstance(b, float) and math.isnan(b))
            elif isinstance(a, float) or isinstance(b, float):
                ok = (b is not None) and abs(float(a) - float(b)) < 1e-9
            else:
                ok = str(a) == str(b)
            if not ok:
                bad = f"col {c} row {i}: expected {a!r} got {b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        print(f"OK   {name} ({len(exp)} rows)")

print()
if fails:
    for n, m in fails:
        print(f"FAIL {n}: {m}")
    sys.exit(1)
print("ALL ORACLES MATCH")
