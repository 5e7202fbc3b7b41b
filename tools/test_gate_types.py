#!/usr/bin/env python3
"""Regression proof for the type-sensitive local gate (r2 VERDICT #2).

r2 shipped four driver hash failures (q107/q132/q145/q146) because a bare
integer sum() is HUGEINT in DuckDB but BIGINT in Spark parquet, and the
value-only local gate couldn't see the difference. This test fabricates
exactly that divergence — a parquet result column written as BIGINT with
an oracle SQL whose column is HUGEINT — and asserts both gate tools FAIL
it, and pass the CAST(... AS BIGINT) version.

Run: python3 tools/test_gate_types.py  (exit 0 = gate works)
"""
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

TOOLS = Path(__file__).resolve().parent


def run_gate(tool, sf_dir, out_dir):
    p = subprocess.run(
        [sys.executable, str(TOOLS / tool), str(sf_dir), str(out_dir)],
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def main():
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        sf = td / "sf"
        out = td / "out"
        sf.mkdir()
        (out / "q_bare_sum").mkdir(parents=True)
        (out / "q_cast_sum").mkdir(parents=True)
        con = duckdb.connect()
        # tiny stand-ins for every registered table name
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(
                f"COPY (SELECT 1 AS x) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
        # the "Spark output": value 3, BIGINT — as Spark's sum() writes it
        con.execute(
            "COPY (SELECT CAST(3 AS BIGINT) AS s) TO "
            f"'{out}/q_bare_sum/part-0.parquet' (FORMAT PARQUET)")
        con.execute(
            "COPY (SELECT CAST(3 AS BIGINT) AS s) TO "
            f"'{out}/q_cast_sum/part-0.parquet' (FORMAT PARQUET)")
        # oracles: same VALUE either way; bare sum is HUGEINT in DuckDB
        (out / "oracle_sql.json").write_text(json.dumps({
            "q_bare_sum":
                "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)",
            "q_cast_sum":
                "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)",
        }))
        ok = True
        for tool in ["compare.py", "oracle_check.py"]:
            _, text = run_gate(tool, sf, out)
            bare_flagged = any(
                "FAIL q_bare_sum" in line and "HUGEINT" in line
                for line in text.splitlines())
            cast_passed = any(
                line.startswith(("PASS q_cast_sum", "OK   q_cast_sum"))
                for line in text.splitlines())
            status = "ok" if bare_flagged and cast_passed else "BROKEN"
            print(f"{tool}: bare-sum flagged={bare_flagged} "
                  f"cast-sum passed={cast_passed} -> {status}")
            ok &= bare_flagged and cast_passed
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
