package graft

import java.sql.Timestamp
import graft.functions.GraftFunctions

/** Semantics of the custom Catalyst expressions (SURVEY.md §2.10) —
  * DuckDB-pinned behaviors: 1-based indexing, inclusive slices, negative
  * indexes from the end, boundary-crossing datediff. */
class ExpressionsSpec extends SparkSpecBase {

  private def one[T](sql: String): T = {
    GraftFunctions.register(spark)
    spark.sql(sql).collect()(0).getAs[T](0)
  }

  test("duck_index on string is 1-based single char") {
    assert(one[String]("SELECT duck_index('hello', 1)") == "h")
    assert(one[String]("SELECT duck_index('hello', 5)") == "o")
  }

  test("duck_index on array is 1-based; negative counts from end") {
    assert(one[Int]("SELECT duck_index(array(10, 20, 30), 1)") == 10)
    assert(one[Int]("SELECT duck_index(array(10, 20, 30), -1)") == 30)
  }

  test("duck_index out of range is null (DuckDB list semantics)") {
    assert(one[Any]("SELECT duck_index(array(1, 2), 9)") == null)
  }

  test("duck_slice on string: inclusive bounds") {
    assert(one[String]("SELECT duck_slice('hello world', 1, 4)") == "hell")
    assert(one[String]("SELECT duck_slice('hello', 2, 3)") == "el")
  }

  test("duck_slice open upper bound clamps to length") {
    assert(one[String](
      s"SELECT duck_slice('hello', 2, ${Int.MaxValue})") == "ello")
  }

  test("duck_slice on array: inclusive 1-based") {
    assert(one[scala.collection.Seq[Int]](
      "SELECT duck_slice(array(1, 2, 3, 4), 2, 3)").toSeq == Seq(2, 3))
    assert(one[scala.collection.Seq[Int]](
      s"SELECT duck_slice(array(1, 2, 3), 2, ${Int.MaxValue})").toSeq
      == Seq(2, 3))
  }

  test("duck_datediff counts minute-boundary crossings, not full minutes") {
    // 10:00:59 → 10:01:00 crosses one minute boundary (DuckDB says 1;
    // Spark's timestampdiff would say 0)
    assert(one[Long](
      """SELECT duck_datediff('minute', TIMESTAMP '2024-01-01 10:00:59',
        |TIMESTAMP '2024-01-01 10:01:00')""".stripMargin) == 1L)
    // same minute → 0 even when 59 s apart
    assert(one[Long](
      """SELECT duck_datediff('minute', TIMESTAMP '2024-01-01 10:00:00',
        |TIMESTAMP '2024-01-01 10:00:59')""".stripMargin) == 0L)
  }

  test("duck_datediff year/month/day boundary semantics") {
    assert(one[Long](
      """SELECT duck_datediff('year', TIMESTAMP '2023-12-31 23:59:59',
        |TIMESTAMP '2024-01-01 00:00:00')""".stripMargin) == 1L)
    assert(one[Long](
      """SELECT duck_datediff('month', TIMESTAMP '2024-01-31 00:00:00',
        |TIMESTAMP '2024-02-01 00:00:00')""".stripMargin) == 1L)
    assert(one[Long](
      """SELECT duck_datediff('day', TIMESTAMP '2024-01-01 23:59:59',
        |TIMESTAMP '2024-01-02 00:00:01')""".stripMargin) == 1L)
  }

  test("duck_round matches DuckDB std::round-on-scaled-value semantics") {
    // the q65 regression cell: scaled value 320995.4999… must round DOWN
    // (Spark's HALF_UP on the BigDecimal expansion says 0.320996)
    assert(one[Double](
      "SELECT duck_round(0.3209954998529308d, 6)") == 0.320995)
    // a clean above-tie rounds up
    assert(one[Double](
      "SELECT duck_round(0.3209955023505671d, 6)") == 0.320996)
    // half away from zero on negatives
    assert(one[Double]("SELECT duck_round(-2.5d, 0)") == -3.0)
    assert(one[Double]("SELECT duck_round(2.5d, 0)") == 3.0)
    // std::round(0.49999999999999994) == 0 (naive floor(x+0.5) says 1)
    assert(one[Double](
      "SELECT duck_round(0.49999999999999994d, 0)") == 0.0)
  }

  test("current_setting reads graft.setting.* then falls back") {
    spark.conf.set("graft.setting.memory_limit", "20G")
    assert(one[String]("SELECT current_setting('memory_limit')") == "20G")
    assert(one[String]("SELECT current_setting('threads')")
      == spark.conf.get("spark.sql.shuffle.partitions"))
  }

  test("pragma_version returns engine version string") {
    assert(one[String]("SELECT pragma_version()").startsWith("graft-"))
  }
}
