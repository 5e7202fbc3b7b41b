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
                    # -0.0 == 0.0 to the driver (Python value hash)
                    vals.append(f"{v + 0.0 if v != 0 else 0.0:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def type_compat(d, s):
    """Type-sensitive compare mirroring the driver's type-aware hash.

    Calibrated against CORRECTNESS_r02: machine-int widths are
    interchangeable (q18/q45/q112/... emit Spark INTEGER vs DuckDB
    BIGINT and passed — both reach the driver as Python ints), but
    HUGEINT (DuckDB's bare integer-sum result) is NOT — it converts to
    float on the driver side and failed q107/q132/q145/q146 there.
    Timestamp flavors reflect parquet physical encoding (accepted).
    """
    if s is None:
        return False
    if d == s:
        return True
    ts = {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S",
          "TIMESTAMP WITH TIME ZONE"}
    ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER"}
    return (d in ts and s in ts) or (d in ints and s in ints)


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
            duck = con.sql(oracle[name])
            d_cols = list(duck.columns)
            d_types = [str(t) for t in duck.types]
            d_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sp = con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        s_cols = list(sp.columns)
        s_types = [str(t) for t in sp.types]
        s_rows = sp.fetchall()
        dc, dr = canon(d_rows, d_cols)
        sc, sr = canon(s_rows, s_cols)
        # The driver's hash is type-aware: a DuckDB HUGEINT (bare integer
        # sum) vs Spark BIGINT fails there even when the values agree, so
        # type divergence must fail here too (r2 shipped 4 such reds while
        # the value-only local gate was green).
        t_diff = [
            (c, dt, dict(zip(s_cols, s_types)).get(c))
            for c, dt in zip(d_cols, d_types)
            if not type_compat(dt, dict(zip(s_cols, s_types)).get(c))
        ]
        if dc != sc:
            print(f"FAIL {name}: columns duck={dc} spark={sc}")
            n_fail += 1
        elif t_diff:
            print(f"FAIL {name}: column types differ (duck vs spark): "
                  f"{t_diff}")
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
