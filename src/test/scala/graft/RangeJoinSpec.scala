package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join: results equal the naive inequality join exactly,
  * and the plan is an equi-join on the bin id, not a nested loop. */
class RangeJoinSpec extends SparkSpecBase {

  private lazy val points = {
    import spark.implicits._
    (0 until 1000).map(i => (i.toLong, i * 0.37 % 100)).toDF("pid", "x")
  }

  private lazy val intervals = {
    import spark.implicits._
    (0 until 50).map { i =>
      val lo = (i * 7.3) % 90
      (i.toLong, lo, lo + 5.0)
    }.toDF("iid", "lo", "hi")
  }

  test("equals the naive inequality join exactly") {
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.pointInInterval(points, intervals,
        "x", "lo", "hi", binWidth = 5.0)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("bins spanning intervals match points in every covered bin") {
    import spark.implicits._
    val ps = Seq((1L, 9.99), (2L, 10.0), (3L, 20.01)).toDF("pid", "x")
    val is = Seq((1L, 9.5, 20.5)).toDF("iid", "lo", "hi") // spans 3 bins
    val out = RangeJoin.pointInInterval(ps, is, "x", "lo", "hi", 10.0)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L)) // all three inside [9.5, 20.5]
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
      "x", "lo", "hi", 5.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
