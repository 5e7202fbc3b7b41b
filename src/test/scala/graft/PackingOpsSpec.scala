package graft

import org.apache.spark.sql.functions._
import graft.operators.PackingOps

/** Sequence packing and temperature mixing semantics: equality with a
  * locally computed reference, invariance to input partitioning (the
  * point of the two-pass prefix sum), and the mixing invariants. */
class PackingOpsSpec extends SparkSpecBase {

  private def referencePack(toks: Seq[(Long, Long)], chunkLen: Int)
      : Map[Long, (Long, Long, Long)] = {
    var off = 0L
    toks.sortBy(_._1).map { case (id, t) =>
      val first = off / chunkLen
      val last = (off + math.max(t, 1L) - 1) / chunkLen
      val r = id -> ((off, first, last))
      off += t
      r
    }.toMap
  }

  test("packChunks equals the sequential definition and is invariant " +
      "to input partitioning") {
    import spark.implicits._
    val data = (0L until 500L).map(i => (i, 1L + (i * 37 % 90)))
    val want = referencePack(data, chunkLen = 128)
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("doc_id", "toks").repartition(parts)
      val got = PackingOps.packChunks(df, "doc_id", "toks", 128)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      assert(got == want, s"mismatch at $parts input partitions")
    }
  }

  test("packChunks flags boundary-crossing documents") {
    import spark.implicits._
    // 100-token docs into 256-token chunks: boundaries at 256/512/768
    // fall inside docs 2 (200..299), 5 (500..599) and 7 (700..799)
    val df = (0L until 8L).map(i => (i, 100L)).toDF("doc_id", "toks")
    val got = PackingOps.packChunks(df, "doc_id", "toks", 256)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.filter(r => r._2 != r._3).map(_._1).toSeq ==
      Seq(2L, 5L, 7L))
  }

  test("packChunks window over the data is pid-partitioned (no global " +
      "single-partition sort of the corpus)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 5L)).toDF("doc_id", "toks")
    val plan = PackingOps.packChunks(df, "doc_id", "toks", 64)
      .queryExecution.optimizedPlan.toString
    // the per-row running sum must be keyed by pid; the only
    // unpartitioned window is over the #partitions-sized totals table
    assert(plan.contains("windowspecdefinition(pid#"), plan)
  }

  test("temperatureMix up-weights low-resource slices and pins the " +
      "selected set") {
    import spark.implicits._
    // 400 docs of 'big', 25 of 'small'
    val df = (0L until 425L)
      .map(i => (i, if (i < 400) "big" else "small"))
      .toDF("doc_id", "lang")
    val got = PackingOps.temperatureMix(df, "doc_id", "lang")
      .orderBy("key").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val (nBig, tBig, kBig, _) = got("big")
    val (nSmall, tSmall, kSmall, sumSmall) = got("small")
    assert(nBig == 400 && nSmall == 25)
    // sqrt weighting: big's kept FRACTION is below small's
    assert(tBig.toDouble / nBig < tSmall.toDouble / nSmall)
    // kept counts are min(target, n); small is fully kept at these
    // proportions (target 85 > 25), big is subsampled
    assert(kSmall == nSmall && sumSmall == (400L until 425L).sum)
    assert(kBig == math.min(tBig, nBig) && kBig < nBig)
    // targets sum to ~N (floor rounding loses at most #slices docs)
    assert(tBig + tSmall <= 425 && tBig + tSmall >= 425 - 2)
  }

  test("temperatureMix with equal slices is a no-op up to rounding") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, s"l${i % 3}"))
      .toDF("doc_id", "lang")
    val got = PackingOps.temperatureMix(df, "doc_id", "lang").collect()
    got.foreach { r =>
      assert(r.getLong(1) == 100)
      assert(r.getLong(2) == 100, r.toString) // equal thirds
      assert(r.getLong(3) == 100)
    }
  }
}
