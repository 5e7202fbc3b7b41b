package graft

import org.apache.spark.sql.SparkSession

/** Irreducible-floor probe for the fact-join family (r16, the r15
  * verdict's #4): for each >2x entry, times the BARE pass the query
  * cannot avoid — the fact-table scan of exactly its columns, its
  * pushed filters, and one DECIMAL aggregate (no join, no exchange
  * beyond the single-row agg). The delta between an entry's full time
  * and its floor is what the join/group machinery costs; the floor
  * itself is the scan constant that a 1000-executor target divides
  * away. min-of-reps on a warmed session; numbers land in the Queries
  * plan notes + BASELINE.md.
  *
  * Usage: runMain graft.JoinFloorProbe <sfDir> [reps]
  */
object JoinFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf30")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("join-floor").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.prep(spark, sfDir)
    Tables.names.foreach(n => spark.table(n).count())
    def t(name: String, sql: String): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).count()
        (System.nanoTime() - t0) / 1e3 / 1e6
      }
      println(f"[floor] $name%-26s ${times.min}%8.3f s (min of $reps)")
    }
    // q08/q09: the orders pass those entries cannot avoid — both
    // payload columns, one DECIMAL sum, no join
    t("orders_2col_sum",
      """SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |  AS s, count(o_custkey) AS n FROM orders""".stripMargin)
    // general lineitem narrow-pass reference point
    t("lineitem_2col_sum",
      """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |  count(l_orderkey) AS n FROM lineitem""".stripMargin)
    // q90: shipdate-filtered revenue pass (3 cols + filter col)
    t("lineitem_q3_filter_sum",
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |  AS DECIMAL(18,6))) AS DOUBLE) AS s
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)
    // q106: returnflag-filtered revenue pass
    t("lineitem_q10_rflag_sum",
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |  AS DECIMAL(18,6))) AS DOUBLE) AS s
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)
    // q91: both fact legs — suppkey revenue pass + date-windowed orders
    t("lineitem_q5_3col_sum",
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |  AS DECIMAL(18,6))) AS DOUBLE) AS s, count(l_suppkey) AS n
        |FROM lineitem""".stripMargin)
    t("orders_q5_window_count",
      """SELECT count(o_custkey) AS n FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin)
    // q105 is already its own floor (pure scan-aggregate)
    spark.stop()
  }
}
