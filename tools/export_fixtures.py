#!/usr/bin/env python3
"""Exports the reference benchmark's 12 DuckDB fixture databases to parquet
(one dir per db, one file per table) so the Spark engine can load them.
Data-only export; reads the .duckdb files read-only."""
import duckdb, os, sys, glob

SRC = "/root/reference/eval/data/databases"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures"

for dbdir in sorted(glob.glob(f"{SRC}/*")):
    db = os.path.basename(dbdir)
    files = glob.glob(f"{dbdir}/*.duckdb")
    if not files:
        os.makedirs(f"{DST}/{db}", exist_ok=True)  # 'none' fixture: empty db
        continue
    con = duckdb.connect(files[0], read_only=True)
    os.makedirs(f"{DST}/{db}", exist_ok=True)
    for (t,) in con.execute("PRAGMA show_tables").fetchall():
        out = f"{DST}/{db}/{t}.parquet"
        con.execute(f"COPY (SELECT * FROM \"{t}\") TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f'SELECT count(*) FROM "{t}"').fetchone()[0]
        print(f"{db}.{t}: {n} rows")
    con.close()

# nullability sidecar: parquet can't carry NOT NULL; DESCRIBE parity needs it
import json as _json
for dbdir in sorted(glob.glob(f"{SRC}/*")):
    db = os.path.basename(dbdir)
    files = glob.glob(f"{dbdir}/*.duckdb")
    if not files: continue
    con = duckdb.connect(files[0], read_only=True)
    schema = {}
    for (t,) in con.execute("PRAGMA show_tables").fetchall():
        desc = con.execute(f'DESCRIBE "{t}"').fetchall()
        schema[t] = {r[0]: r[2] for r in desc}  # col -> 'YES'/'NO'
    _json.dump(schema, open(f"{DST}/{db}/_schema.json", "w"))
    con.close()
print("nullability sidecars written")
