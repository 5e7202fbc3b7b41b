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

TS = {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S",
      "TIMESTAMP WITH TIME ZONE"}
INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER"}

def type_compat(d, s):
    # driver hash is type-aware: HUGEINT (bare int sum) vs BIGINT fails
    # there (float conversion), so it must fail here; machine-int widths
    # and parquet timestamp-encoding flavors are interchangeable (driver
    # r2 accepted INTEGER-vs-BIGINT on q18/q45/q112/... and ts flavors)
    return d == s or (d in TS and s in TS) or (d in INTS and s in INTS)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        d = con.sql(sql)
        dcols = [c.lower() for c in d.columns]
        dtypes = [str(t) for t in d.types]
        drows = d.fetchall()
        scon = duckdb.connect()
        s = scon.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        scols = [c.lower() for c in s.columns]
        stypes = [str(t) for t in s.types]
        srows = s.fetchall()
        if sorted(dcols) != sorted(scols):
            fails.append((name, f"cols duck={sorted(dcols)} spark={sorted(scols)}"))
            continue
        smap = dict(zip(scols, stypes))
        tdiff = [(c, dt, smap[c]) for c, dt in zip(dcols, dtypes)
                 if not type_compat(dt, smap[c])]
        if tdiff:
            fails.append((name, f"types differ (duck vs spark): {tdiff}"))
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
