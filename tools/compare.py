#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — not part
of the Scala library). Reads the Verify output dir (per-query parquet +
oracle_sql.json), runs each oracle SQL in DuckDB against the same sf tables,
and compares canonicalized results.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pq = Path(out_dir, name)
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(oracle[name])
            d_cols = [c[0] for c in duck.description]
            d_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sp = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        s_cols = [c[0] for c in sp.description]
        s_rows = sp.fetchall()
        dc, dr = canon(d_rows, d_cols)
        sc, sr = canon(s_rows, s_cols)
        if dc != sc:
            print(f"FAIL {name}: columns duck={dc} spark={sc}")
            n_fail += 1
        elif dr != sr:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(dr, sr) if a != b]
            print(f"FAIL {name}: {len(dr)} vs {len(sr)} rows, "
                  f"{len(diffs)} differing; first: "
                  f"duck={diffs[0][0] if diffs else dr[:1]} "
                  f"spark={diffs[0][1] if diffs else sr[:1]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(dr)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
