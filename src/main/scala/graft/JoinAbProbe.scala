package graft

import org.apache.spark.sql.SparkSession

/** A/B probe for the fact-join headline shapes that remain >2x DuckDB
  * at the sf10 scale point (tools/headtohead_sf10.json): TPC-H Q3
  * (q90), Q5 (q91), and the plain fact⋈dim aggregates q08/q09. Each
  * candidate is a full SQL rewrite of the same semantics; the probe
  * times min-of-reps per shape on a warmed session so the recorded
  * deltas are plan-shape deltas, not JVM noise. Winners (and the
  * losers' numbers) land as plan notes on the Queries entries, the
  * same methodology as the r15 Q10 restructure (Queries.scala q106).
  *
  * Usage: runMain graft.JoinAbProbe <sfDir> [reps]
  */
object JoinAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf3sv")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("join-ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.prep(spark, sfDir)
    Tables.names.foreach(n => spark.table(n).count())

    val shapes: Seq[(String, String)] = Seq(
      // ---------------- Q3 (q90) ----------------
      "q3_A_current" ->
        """SELECT /*+ BROADCAST(customer) */ o_orderkey,
          |  CAST(o_orderdate AS DATE) AS odate,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      "q3_B_bcast_filtered_orders" ->
        """WITH o AS (SELECT /*+ BROADCAST(customer) */
          |    o_orderkey, o_orderdate
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  WHERE c_mktsegment = 'BUILDING'
          |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
          |SELECT /*+ BROADCAST(o) */ o_orderkey,
          |  CAST(o_orderdate AS DATE) AS odate,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN o ON l_orderkey = o_orderkey
          |WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY o_orderkey, o_orderdate
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      "q3_C_preagg_shuffle" ->
        """WITH la AS (SELECT l_orderkey,
          |    sum(CAST(l_extendedprice * (1 - l_discount)
          |      AS DECIMAL(18,6))) AS rev
          |  FROM lineitem
          |  WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
          |  GROUP BY l_orderkey)
          |SELECT /*+ BROADCAST(customer) */ o_orderkey,
          |  CAST(o_orderdate AS DATE) AS odate,
          |  CAST(rev AS DOUBLE) AS revenue
          |FROM la JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      // ---------------- Q5 (q91) ----------------
      "q5_A_current" ->
        """SELECT /*+ BROADCAST(customer, supplier, nation, region) */
          |  n_name,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |  AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      "q5_B_supp_prefilter_shuffle" ->
        """WITH s AS (SELECT /*+ BROADCAST(nation, region) */
          |    s_suppkey, s_nationkey, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |l AS (SELECT /*+ BROADCAST(s) */ l_orderkey, s_nationkey,
          |    n_name, CAST(l_extendedprice * (1 - l_discount)
          |      AS DECIMAL(18,6)) AS amt
          |  FROM lineitem JOIN s ON l_suppkey = s_suppkey),
          |o AS (SELECT /*+ BROADCAST(customer) */
          |    o_orderkey, c_nationkey
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
          |SELECT n_name, CAST(sum(amt) AS DOUBLE) AS revenue
          |FROM l JOIN o ON l_orderkey = o_orderkey
          |  AND s_nationkey = c_nationkey
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      "q5_C_supp_prefilter_bcast_o" ->
        """WITH s AS (SELECT /*+ BROADCAST(nation, region) */
          |    s_suppkey, s_nationkey, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |o AS (SELECT /*+ BROADCAST(customer) */
          |    o_orderkey, c_nationkey
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
          |SELECT /*+ BROADCAST(s, o) */ n_name,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |FROM lineitem JOIN s ON l_suppkey = s_suppkey
          |JOIN o ON l_orderkey = o_orderkey
          |  AND s_nationkey = c_nationkey
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      // ---------------- q08 ----------------
      "q08_A_current" ->
        """SELECT /*+ BROADCAST(customer) */ c_mktsegment,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q08_B_preagg_custkey" ->
        """WITH oa AS (SELECT o_custkey, count(*) AS n,
          |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
          |  FROM orders GROUP BY o_custkey)
          |SELECT /*+ BROADCAST(customer) */ c_mktsegment,
          |  sum(n) AS n_orders, CAST(sum(tot) AS DOUBLE) AS revenue
          |FROM oa JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      // ---------------- q09 ----------------
      "q09_A_current" ->
        """SELECT /*+ BROADCAST(customer, nation) */ n_name,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,
      "q09_B_agg_below_nation" ->
        """WITH x AS (SELECT /*+ BROADCAST(customer) */ c_nationkey,
          |    count(*) AS n,
          |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY c_nationkey)
          |SELECT /*+ BROADCAST(nation) */ n_name, sum(n) AS n_orders,
          |  CAST(sum(tot) AS DOUBLE) AS revenue
          |FROM x JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,
      // r16: at sf30 customer is 4.5M rows — the broadcast BUILD of a
      // multi-million-entry map is itself a cost; the shuffled-hash
      // dual pays two shuffles but builds per-partition maps
      "q08_C_shuffle_hash" ->
        """SELECT /*+ SHUFFLE_HASH(customer) */ c_mktsegment,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q09_C_shuffle_hash" ->
        """SELECT /*+ SHUFFLE_HASH(customer) BROADCAST(nation) */ n_name,
          |  count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,
      // r16b: does pre-aggregating orders by o_custkey BEFORE the
      // shuffled-hash join beat shuffling raw orders rows? The agg
      // state is ~|customer| groups but the join input shrinks
      "q08_D_preagg_shj" ->
        """WITH oa AS (SELECT o_custkey, count(*) AS n,
          |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
          |  FROM orders GROUP BY o_custkey)
          |SELECT /*+ SHUFFLE_HASH(customer) */ c_mktsegment,
          |  CAST(sum(n) AS BIGINT) AS n_orders,
          |  CAST(sum(tot) AS DOUBLE) AS revenue
          |FROM oa JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      // q91 dual: shuffled-hash on BOTH fact legs instead of SMJ
      "q5_D_shuffle_hash_legs" ->
        """WITH s AS (SELECT /*+ BROADCAST(nation, region) */
          |    s_suppkey, s_nationkey, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |l AS (SELECT /*+ BROADCAST(s) */ l_orderkey, s_nationkey,
          |    n_name, CAST(l_extendedprice * (1 - l_discount)
          |      AS DECIMAL(18,6)) AS amt
          |  FROM lineitem JOIN s ON l_suppkey = s_suppkey),
          |o AS (SELECT /*+ BROADCAST(customer) */
          |    o_orderkey, c_nationkey
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
          |SELECT /*+ SHUFFLE_HASH(o) */ n_name,
          |  CAST(sum(amt) AS DOUBLE) AS revenue
          |FROM l JOIN o ON l_orderkey = o_orderkey
          |  AND s_nationkey = c_nationkey
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    )

    def once(q: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(q).count()
      (System.nanoTime() - t0) / 1e9
    }
    // optional shape-name substring filter (arg 3)
    val only = args.lift(2)
    // codegen warm-up per shape, then min over reps
    shapes.filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, q) =>
      once(q)
      val ts = (1 to reps).map(_ => once(q))
      println(f"$name%-32s min=${ts.min}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
