package graft

import org.apache.spark.sql.functions._
import graft.plans.BinnedRangeJoinRule

/** The optimizer rule must change the PLAN (nested loop → equi-join on
  * the bin id) without changing the RESULT, stay inert when its conf is
  * unset, and refuse shapes it cannot improve (equi-keyed joins). */
class BinnedRangeJoinRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def withRule[A](width: String)(f: => A): A = {
    BinnedRangeJoinRule.install(spark)
    spark.conf.set(BinnedRangeJoinRule.WidthConf, width)
    try f finally spark.conf.unset(BinnedRangeJoinRule.WidthConf)
  }

  private def fixture(): Unit = {
    // points 0..199; intervals of mixed lengths incl. inverted + nulls
    (0 until 200).map(i => (i.toLong, i * 1.0)).toDF("pid", "x")
      .createOrReplaceTempView("pts")
    Seq[(Long, Option[Double], Option[Double])](
      (1L, Some(10.0), Some(30.0)), (2L, Some(25.0), Some(26.5)),
      (3L, Some(150.0), Some(160.0)),
      (4L, Some(90.0), Some(80.0)),       // inverted: matches nothing
      (5L, Some(170.0), None),            // null hi: matches nothing
      (6L, Some(199.0), Some(400.0))      // extends past the points
    ).toDF("iid", "lo", "hi").createOrReplaceTempView("ivl")
  }

  private val bandSql =
    "SELECT pid, iid FROM pts JOIN ivl ON x BETWEEN lo AND hi"

  test("rewrites a BETWEEN join to an equi-join on the bin id") {
    fixture()
    withRule("8.0") {
      val df = spark.sql(bandSql)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"still a nested loop:\n$phys")
      assert(phys.contains("__pbin") || phys.contains("__ibin"),
        s"bin columns missing from plan:\n$phys")
      val got = df.as[(Long, Long)].collect().sorted.toSeq
      val live = Seq((1L, 10.0, 30.0), (2L, 25.0, 26.5),
        (3L, 150.0, 160.0), (6L, 199.0, 400.0))
      val want = (for {
        p <- 0 until 200
        (iid, lo, hi) <- live
        if p >= lo && p <= hi
      } yield (p.toLong, iid)).sorted
      assert(got == want)
    }
  }

  test("result identical with the rule off (nested-loop reference)") {
    fixture()
    val off = spark.sql(bandSql).as[(Long, Long)].collect().sorted.toSeq
    val on = withRule("25.0") {
      spark.sql(bandSql).as[(Long, Long)].collect().sorted.toSeq
    }
    assert(on == off && off.nonEmpty)
  }

  test("strict bounds and reversed operand order still match") {
    fixture()
    val sql = "SELECT pid, iid FROM pts JOIN ivl " +
      "ON lo < x AND hi > x"  // bounds on the left of the comparison
    val off = spark.sql(sql).as[(Long, Long)].collect().sorted.toSeq
    val on = withRule("8.0") {
      val df = spark.sql(sql)
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      df.as[(Long, Long)].collect().sorted.toSeq
    }
    assert(on == off)
  }

  test("inert when the conf is unset and on equi-keyed joins") {
    fixture()
    BinnedRangeJoinRule.install(spark)
    assert(spark.sql(bandSql).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))  // conf unset → untouched
    withRule("8.0") {
      // an equi key makes it a hash/merge join already — must not bin
      val df = spark.sql("SELECT pid, iid FROM pts JOIN ivl " +
        "ON pid = iid AND x >= lo AND x <= hi")
      assert(!df.queryExecution.executedPlan.toString.contains("__pbin"))
    }
  }

  test("install is idempotent") {
    BinnedRangeJoinRule.install(spark)
    BinnedRangeJoinRule.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[BinnedRangeJoinRule]) == 1)
  }

  test("a width far below the interval length fails with a clear " +
      "config error, not an array blowup") {
    fixture()
    withRule("0.00001") { // interval (199, 400) would cover ~20M bins
      val e = intercept[Exception] {
        spark.sql(bandSql).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("binWidth produces more than")),
        e.toString)
    }
  }

  test("fires for a timestamp BETWEEN join (time-zone-aware bin cast)") {
    // timestamps one minute apart + four 15-minute windows
    spark.sql("""SELECT id AS pid,
        timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,id,0) AS ts
      FROM range(200)""").createOrReplaceTempView("tpts")
    spark.sql("""SELECT id AS iid,
        timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,
          CAST(id * 40 AS INT), 0) AS tlo,
        timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,
          CAST(id * 40 + 15 AS INT), 0) AS thi
      FROM range(4)""").createOrReplaceTempView("tivl")
    val sql = "SELECT pid, iid FROM tpts JOIN tivl ON ts BETWEEN tlo AND thi"
    val off = spark.sql(sql).as[(Long, Long)].collect().sorted.toSeq
    val on = withRule("600") { // width in seconds for timestamps
      val df = spark.sql(sql)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"timestamp band still a nested loop:\n$phys")
      assert(phys.contains("__pbin") || phys.contains("__ibin"), phys)
      df.as[(Long, Long)].collect().sorted.toSeq
    }
    assert(on == off && off.nonEmpty)
  }
}
