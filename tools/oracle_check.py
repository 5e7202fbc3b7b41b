#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against Verify's parquet output
(columns sorted by name, rows sorted, float-tolerant)."""
import duckdb, json, sys, glob, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
oracle = json.load(open(f"{out}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        # type-tagged cells keep mixed NULL/number/string columns sortable
        # (a NULL pivot cell next to floats would otherwise TypeError)
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (2, str(v))
        if isinstance(v, float):
            return (3, "nan") if math.isnan(v) else (1, round(v, 6))
        if isinstance(v, int):
            return (1, float(v))
        return (2, str(v))
    return sorted([tuple(cell(r[i]) for i in order) for r in rows])

fails = []
for name, sql in sorted(oracle.items()):
    try:
        d = con.execute(sql)
        dcols = [c[0].lower() for c in d.description]
        drows = d.fetchall()
        s = duckdb.connect().execute(
            f"SELECT * FROM '{out}/{name}/*.parquet'")
        scols = [c[0].lower() for c in s.description]
        srows = s.fetchall()
        if sorted(dcols) != sorted(scols):
            fails.append((name, f"cols duck={sorted(dcols)} spark={sorted(scols)}"))
            continue
        cd, cs = canon(drows, dcols), canon(srows, scols)
        if cd != cs:
            diff = next((i for i,(a,b) in enumerate(zip(cd,cs)) if a!=b), min(len(cd),len(cs)))
            fails.append((name, f"rows duck={len(cd)} spark={len(cs)}; first diff @{diff}: duck={cd[diff] if diff<len(cd) else None} spark={cs[diff] if diff<len(cs) else None}"))
        else:
            print(f"OK   {name} ({len(cd)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle match")
