package graft

/** H7 parse/bind validation semantics (reference
  * examples/validate_sql.py:6-27): parser/binder/catalog errors are
  * invalid; runtime-class problems and timeouts are valid; validation
  * never touches real data. */
class ValidatorSpec extends SparkSpecBase {

  private lazy val engine: Engine = {
    Queries.prep(spark, sfDir)
    val e = new Engine(spark)
    Tables.names.foreach(n => e.register(n, spark.table(n)))
    e
  }

  test("well-formed queries validate") {
    assert(SqlValidator.validate(engine, "SELECT count(*) FROM lineitem"))
    assert(SqlValidator.validate(engine,
      "SELECT c_name FROM customer JOIN orders ON o_custkey = c_custkey"))
    assert(SqlValidator.validate(engine,
      "SELECT * EXCLUDE (c_acctbal) FROM customer"))
  }

  test("syntax errors are invalid") {
    assert(!SqlValidator.validate(engine, "SELEC model FROM part"))
    assert(!SqlValidator.validate(engine, "SELECT FROM WHERE"))
  }

  test("catalog errors (unknown table/column) are invalid") {
    assert(!SqlValidator.validate(engine, "SELECT * FROM no_such_table"))
    assert(!SqlValidator.validate(engine, "SELECT not_a_column FROM part"))
  }

  test("runtime-class errors are valid (reference semantics)") {
    // bad cast can only fail on actual rows; schema-only ⇒ passes bind
    assert(SqlValidator.validate(engine,
      "SELECT CAST('zzz' AS INT) AS x FROM part"))
  }

  test("validation executes against schema-only copies (no data, no " +
      "mutation of the real catalog)") {
    // DML validates fine…
    assert(SqlValidator.validate(engine, "DELETE FROM orders"))
    // …and the real engine still has its rows
    assert(engine.table("orders").count() > 0)
  }

  test("q67 battery verdicts equal DuckDB's own EXPLAIN classification " +
      "(fixture by tools/validator_oracle.py), ids in sync") {
    val expected = spark.read
      .parquet("/root/repo/fixtures/validator_expected.parquet")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    val got = SparkEntry.queries("q67_validate_sql")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    // id-set sync first: a battery edit without regenerating the fixture
    // must fail HERE with the differing ids, not as a gate hash mismatch
    assert(got.keySet == expected.keySet,
      s"battery drift: engine=${got.keySet} fixture=${expected.keySet}")
    assert(got == expected,
      got.toSeq.sorted.zip(expected.toSeq.sorted).mkString("\n"))
  }
}
