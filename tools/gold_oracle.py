#!/usr/bin/env python3
"""Runs the reference benchmark's 75 gold entries (setup_sql -> query ->
validation_sql) in DuckDB against copies of the fixture databases and dumps
canonicalized expected results to fixtures/gold_expected.json.

This re-implements the reference's execution-match oracle (H8 in SURVEY.md
§2.9) for the Spark engine's parity suite. Reference data is read-only."""
import duckdb, json, os, re, shutil, sys, tempfile, datetime

REF = "/root/reference/eval/data"
FIX = "/root/repo/fixtures"
TITANIC_URL = "https://raw.githubusercontent.com/datasciencedojo/datasets/master/titanic.csv"
TITANIC_LOCAL = f"{FIX}/titanic_local.csv"

# per-entry compare modes (0-based index into dev.json)
MODES = {21: "sample", 23: "summarize", 30: "nonempty", 51: "nonempty",
         68: "summarize", 69: "count",
         # 0: ORDER BY count DESC LIMIT 10 has a tie at the boundary —
         # which rows cross the LIMIT differs legitimately between
         # engines; compare the count column only
         0: "project"}
PROJ = {0: [0]}

def canon_cell(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return str(v).lower()
    if isinstance(v, float):
        return f"{round(v, 6):.6f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        s = str(v)
        if "." in s: s = s.rstrip("0").rstrip(".")
        return s
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in v.items()) + "}"
    return str(v)

def canon_rows(rows):
    return sorted(["\x01".join(canon_cell(c) for c in r) for r in rows])

def split_stmts(s):
    out, cur, instr = [], [], False
    for ch in s:
        if ch == "'": instr = not instr
        if ch == ";" and not instr:
            out.append("".join(cur)); cur = []
        else: cur.append(ch)
    if "".join(cur).strip(): out.append("".join(cur))
    return [x.strip() for x in out if x.strip()]

def localize(sql, workdir):
    sql = sql.replace(TITANIC_URL, TITANIC_LOCAL)
    return sql

def run_entry(e, idx):
    workdir = tempfile.mkdtemp(prefix=f"gold_{idx}_")
    os.chdir(workdir)
    db = e["db_id"]
    src = f"{REF}/databases/{db}/{db}.duckdb"
    if os.path.exists(src):
        shutil.copy(src, f"{workdir}/{db}.duckdb")
        con = duckdb.connect(f"{workdir}/{db}.duckdb")
    else:
        con = duckdb.connect()
    if "who.ddb" in e.get("query", "") + e.get("setup_sql", ""):
        shutil.copy(f"{REF}/databases/who/who.duckdb", f"{workdir}/who.ddb")
    for s in split_stmts(localize(e.get("setup_sql", "") or "", workdir)):
        con.execute(s)
    stmts = split_stmts(localize(e["query"], workdir))
    for i, s in enumerate(stmts):
        if i == len(stmts) - 1:
            try:
                con.execute(f"CREATE OR REPLACE TABLE ddb_benchmark_result AS ({s})")
            except Exception:
                # commands (SUMMARIZE/EXPLAIN/CALL/PRAGMA/SET): register
                # their direct result under the conventional name
                df = con.execute(s).fetch_df()
                con.register("ddb_benchmark_result", df)
        else:
            # non-final statements mutate state (multi-statement queries)
            con.execute(s)
    vrows, vcols, vnames = [], 0, []
    for s in split_stmts(localize(e.get("validation_sql", "") or "SELECT * FROM ddb_benchmark_result", workdir)):
        cur = con.execute(s)
        vcols = len(cur.description)
        vnames = [d[0] for d in cur.description]
        vrows = cur.fetchall()
    return workdir, vcols, vrows, con, vnames

def main():
    entries = json.load(open(f"{REF}/dev.json"))
    out = {}
    for idx, e in enumerate(entries):
        mode = MODES.get(idx, "exact")
        try:
            wd, ncols, rows, con, cols = run_entry(e, idx)
            rec = {"db": e["db_id"], "mode": mode, "ncols": ncols,
                   "cols": cols, "category": e.get("category", "")}
            if mode == "exact":
                rec["rows"] = canon_rows(rows)
            elif mode == "project":
                idxs = PROJ[idx]
                rec["proj"] = idxs
                rec["rows"] = canon_rows([[r[i] for i in idxs] for r in rows])
            elif mode == "count":
                # the validation is a scalar count query: record the COUNT
                # VALUE (first cell), not the number of validation rows
                # (which is always 1 for a scalar select)
                rec["rows"] = [canon_cell(rows[0][0])]
            elif mode == "summarize":
                # engine-portable subset: name, type, count
                sub = [(r[0], r[1], r[10]) for r in rows]
                rec["rows"] = canon_rows(sub)
            elif mode == "sample":
                n = con.execute(
                    "SELECT count(*) FROM rideshare").fetchone()[0]
                rec["table_rows"] = n
                rec["rows"] = []
            else:
                rec["rows"] = []
                rec["nonempty"] = len(rows) > 0
            out[str(idx)] = rec
            print(f"{idx}: ok ({mode}, {len(rows)} rows)")
        except Exception as ex:
            print(f"{idx}: ORACLE FAIL {type(ex).__name__}: {ex}")
            out[str(idx)] = {"db": e["db_id"], "mode": "oracle_error",
                             "error": str(ex)}
    json.dump(out, open(f"{FIX}/gold_expected.json", "w"), indent=0)
    bad = [k for k, v in out.items() if v["mode"] == "oracle_error"]
    print(f"\n{len(out)-len(bad)}/{len(out)} oracle entries ok; failures: {bad}")

main()
