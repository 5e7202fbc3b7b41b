package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics on hand-checkable data: latest-at-or-before
  * matching, inclusive ties, per-key isolation, inner vs outer. */
class AsOfJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:03:00"), 200.0)
    ).toDF("k", "qt", "price")
  }

  private lazy val trades = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:04:59"), "t1"), // → 100.0 (10:00)
      (1L, ts("2024-01-01 10:05:00"), "t2"), // → 101.0 (tie: inclusive)
      (1L, ts("2024-01-01 10:30:00"), "t3"), // → 102.0 (latest)
      (2L, ts("2024-01-01 10:04:00"), "t4"), // → 200.0 (own key only)
      (2L, ts("2024-01-01 10:00:00"), "t5")  // → no match (before all)
    ).toDF("k", "tt", "id")
  }

  test("matches the latest quote at or before each trade, per key") {
    val out = AsOfJoin.asofBackward(trades, quotes, "k", "tt", "qt",
        Seq("price"))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(out == Map("t1" -> 100.0, "t2" -> 101.0, "t3" -> 102.0,
      "t4" -> 200.0))
  }

  test("inner semantics drop unmatched; outer keeps them with null") {
    val inner = AsOfJoin.asofBackward(trades, quotes, "k", "tt", "qt",
      Seq("price"))
    assert(inner.count() == 4) // t5 dropped
    val outer = AsOfJoin.asofBackward(trades, quotes, "k", "tt", "qt",
      Seq("price"), keepUnmatched = true)
    assert(outer.count() == 5)
    val t5 = outer.where(col("id") === "t5").collect()(0)
    assert(t5.isNullAt(3))
  }

  test("a NULL right timestamp never matches (no fabricated carries)") {
    import spark.implicits._
    val q = Seq((1L, Option.empty[Timestamp], 99.0),
        (1L, Some(ts("2024-01-01 10:05:00")), 101.0))
      .toDF("k", "qt", "price")
    val t = Seq((1L, ts("2024-01-01 10:01:00"), "early"),
        (1L, ts("2024-01-01 10:06:00"), "late"))
      .toDF("k", "tt", "id")
    val out = AsOfJoin.asofBackward(t, q, "k", "tt", "qt", Seq("price"))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    // "early" precedes every non-null quote → dropped, never given 99.0
    assert(out == Map("late" -> 101.0))
  }

  test("right-side ties on (key, ts) resolve deterministically") {
    import spark.implicits._
    val q = Seq((1L, ts("2024-01-01 10:00:00"), 5.0),
        (1L, ts("2024-01-01 10:00:00"), 9.0))
      .toDF("k", "qt", "price").repartition(8) // scramble physical order
    val t = Seq((1L, ts("2024-01-01 10:01:00"), "t1")).toDF("k", "tt", "id")
    val picks = (1 to 5).map { _ =>
      AsOfJoin.asofBackward(t, q, "k", "tt", "qt", Seq("price"))
        .collect()(0).getDouble(3)
    }
    assert(picks.distinct.length == 1, picks.mkString(","))
  }

  test("equals the naive inequality join on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    // distinct minutes per key → the naive argmax is unique, so the
    // comparison is exact without modeling tie-break order
    val q = (1 to 20).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(30)
        .map(m => (k.toLong, new Timestamp(base + m * 60000L),
          rnd.nextDouble()))
    }.toDF("k", "qt", "price")
    val t = (1 to 25).flatMap { k =>           // keys 21-25: no quotes
      (0 until 20).map(i => (k.toLong,
        new Timestamp(base + rnd.nextInt(600) * 60000L), s"$k-$i"))
    }.toDF("k", "tt", "id")

    val ours = AsOfJoin.asofBackward(t, q, "k", "tt", "qt", Seq("price"))
      .select("id", "price").as[(String, Double)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l.id")).orderBy(col("r.qt").desc)
    val naive = t.as("l").join(q.as("r"),
        col("l.k") === col("r.k") && col("r.qt") <= col("l.tt"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l.id"), col("r.price"))
      .as[(String, Double)].collect().toMap
    assert(ours == naive)
    assert(ours.nonEmpty && ours.size < 500) // some rows matched, some not
  }

  test("forward variant matches the earliest quote at or after each trade") {
    val out = AsOfJoin.asofForward(trades, quotes, "k", "tt", "qt",
        Seq("price"))
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    // t1 (10:04:59) → 101.0 (10:05); t2 (10:05) → 101.0 (inclusive tie);
    // t3 (10:30) → no later quote (dropped); t4 (10:04) → none for key 2
    // after 10:03 → dropped; t5 (10:00) → 200.0 (10:03)
    assert(out == Map("t1" -> 101.0, "t2" -> 101.0, "t5" -> 200.0))
  }

  test("forward equals the naive inequality join on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val q = (1 to 20).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(30)
        .map(m => (k.toLong, new Timestamp(base + m * 60000L),
          rnd.nextDouble()))
    }.toDF("k", "qt", "price")
    val t = (1 to 25).flatMap { k =>
      (0 until 20).map(i => (k.toLong,
        new Timestamp(base + rnd.nextInt(600) * 60000L), s"$k-$i"))
    }.toDF("k", "tt", "id")

    val ours = AsOfJoin.asofForward(t, q, "k", "tt", "qt", Seq("price"))
      .select("id", "price").as[(String, Double)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l.id")).orderBy(col("r.qt").asc)
    val naive = t.as("l").join(q.as("r"),
        col("l.k") === col("r.k") && col("r.qt") >= col("l.tt"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l.id"), col("r.price"))
      .as[(String, Double)].collect().toMap
    assert(ours == naive)
    assert(ours.nonEmpty && ours.size < 500)
  }

  test("plans as one shuffle + window, not an inequality join") {
    val plan = AsOfJoin.asofBackward(trades, quotes, "k", "tt", "qt",
      Seq("price")).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
