#!/usr/bin/env python3
"""Validator oracle generator: DuckDB's OWN parse/bind classification of
the q67 statement battery, written as a fixture parquet.

The engine's SqlValidator (H7) classifies statements with Spark's
parser/analyzer over a schema-only scratch catalog. This script runs
the SAME battery through DuckDB — `EXPLAIN <stmt>` parses and binds
(including DDL) without executing, so a runtime-only failure like
CAST('zzz' AS INT) classifies as valid while syntax/catalog/column
errors classify as invalid — and records DuckDB's verdicts to
fixtures/validator_expected.parquet. q67's oracle reads that fixture,
so the correctness gate pins the engine's classification to DuckDB's
actual classification, not to a hand-written expectation.

The battery below MUST stay in sync with q67_validate_sql
(SystemQueries.scala); a drift fails the q67 gate loudly (row/hash
mismatch), which is the intended alarm.
"""
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
OUT = "/root/repo/fixtures/validator_expected.parquet"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BATTERY = [
    ("s01_ok_select", "SELECT count(*) FROM lineitem"),
    ("s02_ok_join",
     "SELECT c_name FROM customer JOIN orders ON o_custkey = c_custkey"),
    ("s03_bad_syntax", "SELEC model FROM part"),
    ("s04_bad_table", "SELECT * FROM no_such_table"),
    ("s05_bad_column", "SELECT not_a_column FROM part"),
    ("s06_ok_ddl", "CREATE TABLE v_tmp AS SELECT 1 AS x"),
    ("s07_runtime_ok", "SELECT CAST('zzz' AS INT) FROM part"),
]


def main() -> None:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{SF_DIR}/{t}.parquet')")
    rows = []
    for stmt_id, sql in BATTERY:
        try:
            # EXPLAIN parses + binds (DDL included) without executing
            conn.execute(f"EXPLAIN {sql}")
            ok = True
        except duckdb.Error:
            ok = False
        rows.append((stmt_id, ok))
        print(f"{stmt_id}: {'valid' if ok else 'invalid'}")
    pq.write_table(pa.table({
        "stmt_id": pa.array([r[0] for r in rows], pa.string()),
        "valid": pa.array([r[1] for r in rows], pa.bool_()),
    }), OUT)
    print(f"wrote {len(rows)} verdicts to {OUT}")


if __name__ == "__main__":
    main()
