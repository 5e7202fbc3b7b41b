package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Skew strategies: salted results must equal the plain results exactly
  * (salting is a physical rewrite, never a semantic one), and bucketed
  * joins must plan without a shuffle on the bucketed side. */
class JoinOpsSpec extends SparkSpecBase {

  /** Planted skew: key 1 holds 10k rows, keys 2-100 hold 10 each. */
  private lazy val skewed = {
    import spark.implicits._
    val hot = (1 to 10000).map(i => (1L, i.toDouble))
    val tail = for (k <- 2 to 100; i <- 1 to 10) yield (k.toLong, i.toDouble)
    (hot ++ tail).toDF("k", "v")
  }

  test("saltedAggregate equals plain aggregation exactly") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = JoinOps.saltedAggregate(skewed, "k", 8,
        partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
        finalAgg = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("saltedAggregate keeps the caller's key column name") {
    val out = JoinOps.saltedAggregate(skewed, "k", 4,
      partial = Seq(count(lit(1)).as("pn")),
      finalAgg = Seq(sum("pn").as("n")))
    assert(out.columns.toSeq == Seq("k", "n"))
  }

  test("saltedJoin equals plain join exactly") {
    import spark.implicits._
    val dim = (1 to 100).map(k => (k.toLong, s"name_$k")).toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = JoinOps.saltedJoin(skewed, dim, "k", "dk", 8)
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salt spreads a hot key of byte-identical duplicate rows") {
    import spark.implicits._
    // the degenerate shape: every row of the hot key is IDENTICAL (a
    // whole-row hash would put them all on one reducer)
    val dups = Seq.fill(10000)((1L, 1.0)).toDF("k", "v")
    val perSalt = dups
      .withColumn("__salt", JoinOps.saltExpr(8))
      .groupBy("__salt").count().collect()
    assert(perSalt.length == 8, perSalt.mkString(","))
    // no single salt holds the whole hot key
    assert(perSalt.forall(_.getLong(1) < 10000))
  }

  test("bucketed join plans without an exchange on the bucketed sides") {
    Queries.prep(spark, sfDir)
    // managed-table data lands in the session's warehouse dir; the DROPs
    // in the finally delete it again (warehouse.dir is a static conf —
    // it cannot be pointed at a temp dir per-test)
    try {
      spark.table("orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bkt")
      spark.table("customer").write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_bkt")
      val joined = spark.sql(
        """SELECT /*+ MERGE(orders_bkt) */ c_custkey, count(*) AS n
          |FROM orders_bkt JOIN customer_bkt ON o_custkey = c_custkey
          |GROUP BY c_custkey""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      // both scans are pre-bucketed on the join key: the sort-merge join
      // consumes bucket outputs directly, no Exchange below the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan)
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
