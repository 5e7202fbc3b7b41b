package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.TimestampType

/** Loader contract tests: schema preflight over the real testdata (so
  * format drift fails here with a named message, not as 180 cryptic
  * query failures) and degraded registration (one bad table must not
  * take down the other nine). */
class TablesSpec extends SparkSpecBase {

  test("schema preflight: every table loads and events.ts is a timestamp") {
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n)
      assert(df.columns.nonEmpty, s"$n has no columns")
      // a metadata-level encoding change in the testdata should fail
      // THIS assertion by name, not every downstream query
      if (n == "events")
        assert(df.schema("ts").dataType == TimestampType,
          s"events.ts normalized to ${df.schema("ts").dataType}, " +
            "expected TimestampType — testdata encoding drifted again?")
    }
  }

  test("normalizeEventTs handles both historical ts encodings") {
    import spark.implicits._
    // micros-NTZ generation (current testdata): cast path
    val ntz = spark.sql(
      "SELECT CAST(timestamp_ntz'2024-01-02 03:04:05.123456' AS TIMESTAMP_NTZ) AS ts")
    assert(Tables.normalizeEventTs(ntz).schema("ts").dataType == TimestampType)
    // nanos-as-long generation (pre-r6 testdata): div path. 1.7e18 ns
    // deliberately exceeds double's 2^53 integer range — the conversion
    // must use integer division, not float math.
    val nanos = Seq(1700000000123456789L).toDF("ts")
    val out = Tables.normalizeEventTs(nanos)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unixMicros(out("ts"))).head.getLong(0)
    assert(micros == 1700000000123456L)
  }

  private def unixMicros(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.unix_micros(c)

  test("one corrupt table degrades to a named skip, the rest register") {
    // a scratch sf dir: real parquet for every table except lineitem,
    // which is garbage bytes — load must fail for it alone
    val dir = Files.createTempDirectory("graft_degraded").toString
    Tables.names.foreach { n =>
      val src = Paths.get(s"$sfDir/$n.parquet")
      if (n == "lineitem")
        Files.write(Paths.get(s"$dir/$n.parquet"), "not parquet".getBytes)
      else Files.copy(src, Paths.get(s"$dir/$n.parquet"))
    }
    // fresh session so this suite's degraded registration can't poison
    // the shared one (memo is per-session identity)
    val s2 = spark.newSession()
    Tables.registerAll(s2, dir)
    assert(!s2.catalog.tableExists("lineitem"),
      "corrupt table must not be registered")
    assert(s2.table("orders").count() > 0)
    assert(s2.table("events").schema("ts").dataType == TimestampType)
    // and the healthy original dir still registers fully on the SAME
    // session (memo records the degraded subset, not a false 'all ok')
    Tables.registerAll(s2, sfDir)
    assert(s2.table("lineitem").count() > 0)
  }

  test("degraded registration retries the missing table on the next " +
      "call once the transient failure clears") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_retry").toString
    Tables.names.foreach { n =>
      val src = Paths.get(s"$sfDir/$n.parquet")
      if (n == "lineitem")
        Files.write(Paths.get(s"$dir/$n.parquet"), "mid-write".getBytes)
      else Files.copy(src, Paths.get(s"$dir/$n.parquet"))
    }
    val s2 = spark.newSession()
    Tables.registerAll(s2, dir)
    assert(!s2.catalog.tableExists("lineitem"))
    // the "regeneration" completes; a SAME-dir registerAll must pick up
    // the table instead of memo-sticking the degraded subset forever
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"),
      Paths.get(s"$dir/lineitem.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Tables.registerAll(s2, dir)
    assert(s2.catalog.tableExists("lineitem"),
      "degraded memo never retried the failed table")
    assert(s2.table("lineitem").count() > 0)
  }
}
