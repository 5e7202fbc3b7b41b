#!/usr/bin/env python3
"""DuckDB head-to-head timing (dev tool — evidence for the BENCH
"within 2x of DuckDB at the same sf" contract, recorded in BASELINE.md).

For every entry of a Bench per-entry-min map that has an oracle SQL,
times the oracle in DuckDB (same parquet tables, same semantics) and
reports per-entry ratios plus the aggregate over the ENGINE-COMPARABLE
subset. Excluded from the aggregate, with the reason printed:

  * streaming entries (micro-batch checkpoint floor; no batch analogue)
  * commit/layout/maintenance entries (the oracle pins CONTENT equality
    of a write lifecycle, it does not perform the writes)
  * entries whose oracle is the intentionally-quadratic exact dual of a
    sub-quadratic Spark path (the oracle is the rejected alternative,
    not an implementation: comparing against it measures the oracle's
    design, cf. q42's 418x)
  * media-decode entries (the oracle checks fixture checksums; DuckDB
    does not decode PNG/WAV/GIF)

Usage:
  python3 tools/headtohead.py <sfDir> <oracle_sql.json> <bench.json> [reps]

bench.json = a Bench stdout line with the per-entry "queries" min map.
"""
import json
import re
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name-pattern → exclusion reason (aggregate skips these; they are
# still timed and listed when DuckDB can run them)
EXCLUDE = [
    (r"stream", "streaming floor"),
    (r"snapshot|commit|zorder|compact|vacuum|maintenance|time_travel"
     r"|cdc|wap|write_audit|governed|bucket_layout|bucketed_join"
     r"|merge_schema|evolution|incr_agg|stats_pruned|point_index"
     r"|manifest_group|mor_|table_changes|restore_table|eq_delete"
     r"|stats_skipping|sql_pruned|write_layout|meta_count"
     r"|column_evolution|prompt_overflow|or_pruning"
     r"|hidden_partitioning|warehouse_lifecycle|table_tags|branch_fork"
     r"|sql_merge",
     "write/commit lifecycle"),
    (r"dedup_pairs|near_dup|minhash|simhash_hamming|segment_dedup"
     r"|bitext|cluster_safe|exact_substring|dup_clusters",
     "quadratic-exact oracle (the rejected alternative)"),
    (r"image|audio|gif|video|media|dhash|scene", "media decode fixture"),
]


def reason(name: str):
    for pat, why in EXCLUDE:
        if re.search(pat, name):
            return why
    return None


def _time_entry(sf_dir, sql, reps, q):
    """Child-process timing: a hung DuckDB operator (interrupt() is
    not honored mid-pipeline by every operator — observed at sf10) is
    killed by the parent instead of wedging the whole harness."""
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = []
    try:
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
            if times[-1] > 5:  # slow query: one measurement is enough
                break
        q.put(("ok", times))
    except Exception as e:  # noqa: BLE001 - report and die
        q.put(("err", f"{type(e).__name__}: {str(e)[:80]}"))


def main():
    import multiprocessing as mp
    sf_dir, oracle_path, bench_path = sys.argv[1:4]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    oracles = json.loads(Path(oracle_path).read_text())
    bench = json.loads(Path(bench_path).read_text())
    queries = bench["queries"]
    rows = []
    for name, graft_s in sorted(queries.items()):
        sql = oracles.get(name)
        if not sql or graft_s < 0:
            continue
        excl = reason(name)
        if excl:  # excluded from the aggregate → don't burn time on it
            rows.append({"name": name, "graft_s": round(graft_s, 3),
                         "duck_s": None, "ratio": None,
                         "excluded": excl, "err": None})
            continue
        print(f"timing {name}…", file=sys.stderr, flush=True)
        # per-entry wall budget: some oracles are written for
        # correctness clarity, not speed, and a pathological plan at
        # sf>=1 can burn an hour on one entry. Timing runs in a CHILD
        # process with a hard kill — a timed-out entry is recorded as
        # err (dropped from the aggregate), honest in the conservative
        # direction since an absurdly slow DuckDB time would only
        # flatter the graft ratio.
        times = []
        err = None
        q = mp.Queue()
        proc = mp.Process(target=_time_entry, args=(sf_dir, sql, reps, q))
        proc.start()
        proc.join(180.0)
        if proc.is_alive():
            proc.terminate()
            proc.join(10.0)
            if proc.is_alive():
                proc.kill()
            err = "timeout>180s (killed)"
        else:
            try:
                kind, payload = q.get_nowait()
                if kind == "ok":
                    times = payload
                else:
                    err = payload
            except Exception:  # noqa: BLE001 - died without reporting
                err = "child exited without result"
        # floor at timer resolution so a sub-ms DuckDB time neither
        # divides to an absurd ratio nor (the old falsy-zero bug)
        # silently drops the entry from the comparable aggregate —
        # dropped sub-ms entries are exactly graft's WORST ratios
        duck_s = (max(sorted(times)[len(times) // 2], 1e-4)
                  if times else None)
        rows.append({"name": name, "graft_s": round(graft_s, 3),
                     "duck_s": round(duck_s, 4) if duck_s is not None
                     else None,
                     "ratio": round(graft_s / duck_s, 2)
                     if duck_s is not None else None,
                     "excluded": reason(name), "err": err})
    comparable = [r for r in rows if r["duck_s"] is not None
                  and not r["excluded"] and not r["err"]]
    g = sum(r["graft_s"] for r in comparable)
    d = sum(r["duck_s"] for r in comparable)
    out = {
        "sf": sf_dir,
        "n_timed": len([r for r in rows if r["duck_s"] is not None]),
        "n_comparable": len(comparable),
        "graft_total_s": round(g, 2),
        "duck_total_s": round(d, 2),
        "aggregate_ratio": round(g / d, 2) if d else None,
        "over_2x": sorted(
            [{k: r[k] for k in ("name", "graft_s", "duck_s", "ratio")}
             for r in comparable if r["ratio"] and r["ratio"] > 2],
            key=lambda r: -r["ratio"]),
        "graft_faster": sorted(
            [{k: r[k] for k in ("name", "graft_s", "duck_s", "ratio")}
             for r in comparable if r["ratio"] and r["ratio"] < 1],
            key=lambda r: r["ratio"]),
        "rows": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
