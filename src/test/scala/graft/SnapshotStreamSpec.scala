package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotOps
import graft.streaming.SnapshotStream

/** The snapshot-table streaming SOURCE: version-granular batches,
  * checkpointed resume, DV application, and the rewrite-span refusal —
  * the contracts the q262 entry's oracle can't see from row content
  * alone. */
class SnapshotStreamSpec extends SparkSpecBase {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("drains one batch per version under maxVersionsPerBatch=1 and " +
      "resumes from the checkpoint after new commits") {
    import spark.implicits._
    val t = freshDir("graft_ss1")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss1_c").toString
    def wave(ids: Range, tag: String) =
      ids.map(i => (i.toLong, tag)).toDF("id", "tag")
    SnapshotOps.commitAppend(spark, t, wave(1 to 10, "w1"))
    SnapshotOps.commitAppend(spark, t, wave(11 to 20, "w2"))
    SnapshotOps.commitAppend(spark, t, wave(21 to 30, "w3"))
    val run1 = SnapshotStream.drainCollect(spark, t, ckpt,
      maxVersionsPerBatch = 1)
    assert(run1.size == 3)
    // batch k holds exactly wave k+1's rows (version-granular spans)
    val tags = run1.map(_._2.map(_.getString(1)).distinct)
    assert(tags == Seq(Seq("w1"), Seq("w2"), Seq("w3")))
    assert(run1.map(_._2.size) == Seq(10, 10, 10))
    // nothing new: an empty drain commits no batch
    assert(SnapshotStream.drainCollect(spark, t, ckpt).isEmpty)
    // resume: only the post-checkpoint span drains, and it re-reads
    // the same immutable files a replay would
    SnapshotOps.commitAppend(spark, t, wave(31 to 35, "w4"))
    val run2 = SnapshotStream.drainCollect(spark, t, ckpt)
    assert(run2.size == 1 && run2.head._2.map(_.getLong(0)).sorted ==
      (31L to 35L))
  }

  test("first batch from version 0 is the full visible snapshot: " +
      "deletion vectors of the end version apply") {
    import spark.implicits._
    val t = freshDir("graft_ss2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss2_c").toString
    SnapshotOps.commitAppend(spark, t,
      (1L to 40L).map(i => (i, s"r$i")).toDF("id", "tag"))
    SnapshotOps.commitDelete(spark, t, col("id") <= 5L)
    val run = SnapshotStream.drainCollect(spark, t, ckpt)
    assert(run.size == 1)
    assert(run.head._2.map(_.getLong(0)).sorted == (6L to 40L))
  }

  test("a rewrite span fails the batch loudly instead of emitting " +
      "silently wrong rows") {
    import spark.implicits._
    val t = freshDir("graft_ss3")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss3_c").toString
    SnapshotOps.commitAppend(spark, t,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"))
    // consumer catches up through v1
    assert(SnapshotStream.drainCollect(spark, t, ckpt).size == 1)
    // MOR update of base rows: an append-shaped consumer would
    // double-count — the batch must fail with the snapshotDiff pointer
    SnapshotOps.commitUpdateMoR(spark, t, col("id") <= 3L,
      _.withColumn("v", col("v") + lit(100.0)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      SnapshotStream.drainCollect(spark, t, ckpt)
    }
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
    assert(messages(e).exists(_.contains("snapshotDiff")))
  }

  // ---- change-feed mode (r12): mode=diff batches are snapshotDiff
  // spans, so rewrite-class commits stream as row-level deltas -----------

  test("change feed: each version-granular batch equals the batch " +
      "snapshotDiff, including MOR-delete and COW-rewrite spans") {
    import spark.implicits._
    val t = freshDir("graft_ss4")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss4_c").toString
    SnapshotOps.commitAppend(spark, t,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"))
    SnapshotOps.commitAppend(spark, t,
      (21L to 30L).map(i => (i, i * 1.0)).toDF("id", "v"))
    SnapshotOps.commitDelete(spark, t, col("id") <= 3L)      // MOR span
    SnapshotOps.commitRewrite(spark, t, col("id") >= 28L,    // COW span
      _.withColumn("v", col("v") + lit(100.0)))
    val run = SnapshotStream.drainCollect(spark, t, ckpt,
      maxVersionsPerBatch = 1, mode = "diff")
    assert(run.size == 4, s"one diff batch per version, got ${run.size}")
    def canon(rows: Seq[org.apache.spark.sql.Row]): Seq[(Long, Double, String)] =
      rows.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    (1 to 4).foreach { v =>
      val oracle = SnapshotOps.snapshotDiff(spark, t, v - 1, v)
        .select(col("id"), col("v"), col("change_type")).collect().toSeq
      assert(canon(run(v - 1)._2) == canon(oracle),
        s"batch $v != snapshotDiff(${v - 1}, $v)")
    }
    // the MOR span is pure deletes; the COW span is delete+insert pairs
    assert(run(2)._2.map(_.getString(2)).distinct == Seq("delete"))
    assert(run(3)._2.map(_.getString(2)).toSet == Set("delete", "insert"))
    // net-applying all four batches reconstructs the visible table
    val net = run.flatMap(_._2)
      .groupBy(r => (r.getLong(0), r.getDouble(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => if (r.getString(2) == "insert") 1 else -1).sum }
      .filter(_._2 != 0)
    assert(net.values.forall(_ == 1), "net multiplicity is 0 or 1 here")
    val visible = SnapshotOps.readLatest(spark, t)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(net.keySet == visible,
      "net-applied change feed == the table's visible content")
  }

  test("row-capped admission: spans stop before exceeding " +
      "maxRowsPerBatch, and one over-cap commit still drains") {
    import spark.implicits._
    val t = freshDir("graft_ss6")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss6_c").toString
    def wave(ids: Range) = ids.map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    SnapshotOps.commitAppend(spark, t, wave(1 to 5))    // v1: 5 rows
    SnapshotOps.commitAppend(spark, t, wave(6 to 10))   // v2: 5 rows
    SnapshotOps.commitAppend(spark, t, wave(11 to 30))  // v3: 20 rows
    SnapshotOps.commitAppend(spark, t, wave(31 to 34))  // v4: 4 rows
    // cap 12: v1+v2 fit (10), v3 alone exceeds the cap but is the
    // FIRST pending version of its batch — progress guarantee — and
    // v4 cannot ride with it
    val run = SnapshotStream.drainCollect(spark, t, ckpt,
      maxRowsPerBatch = 12L)
    assert(run.map(_._2.size) == Seq(10, 20, 4),
      s"expected spans [v1+v2], [v3], [v4]; got ${run.map(_._2.size)}")
    assert(run.flatMap(_._2.map(_.getLong(0))).sorted == (1L to 34L))
  }

  test("change feed: resume drains only post-checkpoint spans; a " +
      "compaction span nets to zero rows, not a failure") {
    import spark.implicits._
    val t = freshDir("graft_ss5")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss5_c").toString
    SnapshotOps.commitAppend(spark, t,
      (1L to 15L).map(i => (i, s"r$i")).toDF("id", "tag"))
    assert(SnapshotStream.drainCollect(spark, t, ckpt, mode = "diff")
      .size == 1)
    // a pure-layout rewrite: same rows, different files — the append
    // source would refuse this span; the change feed nets it to zero
    SnapshotOps.commitCompact(spark, t, nFiles = 1)
    val run = SnapshotStream.drainCollect(spark, t, ckpt, mode = "diff")
    assert(run.map(_._2.size).sum == 0,
      s"compaction span must net to zero diff rows, got $run")
  }

  test("change-feed batches carry the span-end commit timestamp " +
      "(Delta CDF's _commit_timestamp)") {
    import spark.implicits._
    val t = freshDir("graft_ss7")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss7_c").toString
    SnapshotOps.commitAppend(spark, t,
      (1L to 5L).map(i => (i, s"r$i")).toDF("id", "tag"))
    SnapshotOps.commitAppend(spark, t,
      (6L to 8L).map(i => (i, s"r$i")).toDF("id", "tag"))
    val run = SnapshotStream.drainCollect(spark, t, ckpt,
      maxVersionsPerBatch = 1, mode = "diff")
    assert(run.size == 2)
    (1 to 2).foreach { v =>
      val want = SnapshotOps.snapshotTimestamp(t, v).get
      assert(run(v - 1)._2.nonEmpty &&
        run(v - 1)._2.forall(
          _.getAs[Long]("_commit_timestamp") == want),
        s"batch $v rows must carry v$v's commit stamp")
    }
  }

  test("append-mode replay over schema evolution: pre-evolution " +
      "batches pad the added column with typed nulls instead of " +
      "failing on legal history") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = freshDir("graft_ss8")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss8_c").toString
    SnapshotOps.commitAppend(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))            // v1
    SnapshotOps.commitAppend(spark, t,
      Seq((3L, "c", 30L)).toDF("id", "tag", "extra"))         // v2 evolved
    // pin the EVOLVED schema (what a query started today resolves)
    // and replay history one version per batch: batch 1 reads files
    // that predate `extra`
    val evolved = new StructType()
      .add("id", LongType).add("tag", StringType).add("extra", LongType)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[org.apache.spark.sql.Row])]
    val q = spark.readStream.format("graft-snapshot")
      .schema(evolved)
      .option("path", t)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          got.synchronized { got += ((id, b.collect().toSeq)) }; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = got.sortBy(_._1).map(_._2).toSeq
    assert(batches.size == 2)
    assert(batches(0).map(r => (r.getLong(0), r.getString(1))).sorted ==
      Seq((1L, "a"), (2L, "b")))
    assert(batches(0).forall(_.isNullAt(2)),
      "pre-evolution rows surface the added column as null")
    assert(batches(1).map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))) == Seq((3L, "c", 30L)))
  }

  // ---- the streaming SINK (r16): writeStream.format("graft") ----

  private def drainTo(srcDir: String, sinkDir: String, ckpt: String,
      appId: String, maxPerBatch: Int = 1): Unit = {
    val q = spark.readStream.format("graft-snapshot")
      .option("path", srcDir)
      .option("maxVersionsPerBatch", maxPerBatch.toString)
      .load()
      .writeStream.format("graft")
      .option("path", sinkDir)
      .option("txnAppId", appId)
      .option("statsCols", "id")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("sink append mode: table-to-table replication through stock " +
      "API only — one committed version per micro-batch, exactly-once " +
      "under full epoch replay") {
    import spark.implicits._
    val src = freshDir("graft_sk1s")
    val dst = freshDir("graft_sk1d")
    def wave(ids: Range, tag: String) =
      ids.map(i => (i.toLong, tag)).toDF("id", "tag")
    SnapshotOps.commitAppend(spark, src, wave(1 to 10, "w1"))
    SnapshotOps.commitAppend(spark, src, wave(11 to 20, "w2"))
    SnapshotOps.commitAppend(spark, src, wave(21 to 30, "w3"))
    val c1 = java.nio.file.Files.createTempDirectory("graft_sk1c").toString
    drainTo(src, dst, c1, "repl")
    assert(SnapshotOps.currentVersion(dst) == 3)
    def ids(dir: String): Seq[Long] =
      spark.read.format("graft").load(dir)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(dst) == (1L to 30L))
    // full epoch replay: a FRESH checkpoint restarts batch ids at 0,
    // re-delivering every span — the sink's txn watermark skips each
    // one before reading or writing a byte (no new versions, no dupes)
    val c2 = java.nio.file.Files.createTempDirectory("graft_sk1c2").toString
    drainTo(src, dst, c2, "repl")
    assert(SnapshotOps.currentVersion(dst) == 3,
      "replayed epochs must skip, not re-commit")
    assert(ids(dst) == (1L to 30L))
    // a genuinely new epoch — resuming the ORIGINAL checkpoint, so
    // its batch id advances past the watermark — still lands
    SnapshotOps.commitAppend(spark, src, wave(31 to 35, "w4"))
    drainTo(src, dst, c1, "repl")
    assert(SnapshotOps.currentVersion(dst) == 4)
    assert(ids(dst) == (1L to 35L))
  }

  test("sink complete mode: each epoch's aggregation state overwrites " +
      "the table as one committed version; history spans epochs") {
    import spark.implicits._
    val src = freshDir("graft_sk2s")
    val dst = freshDir("graft_sk2d")
    SnapshotOps.commitAppend(spark, src,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "tag"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sk2c").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("path", src).load()
      .groupBy($"tag").agg(count(lit(1)).as("n"))
      .writeStream.format("graft")
      .option("path", dst).option("txnAppId", "agg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.format("graft").load(dst)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("sink update mode: changed rows upsert by mergeKeys; missing " +
      "mergeKeys is rejected at query start") {
    import spark.implicits._
    val src = freshDir("graft_sk3s")
    val dst = freshDir("graft_sk3d")
    // seed the sink, then stream an overlapping wave as upserts
    SnapshotOps.commitAppend(spark, dst,
      Seq((1L, "old"), (2L, "old")).toDF("id", "tag"))
    SnapshotOps.commitAppend(spark, src,
      Seq((2L, "new"), (3L, "new")).toDF("id", "tag"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sk3c").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("path", src).load()
      .writeStream.format("graft")
      .option("path", dst).option("txnAppId", "ups")
      .option("mergeKeys", "id")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.format("graft").load(dst)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "old"), (2L, "new"), (3L, "new")))
    intercept[Exception] {
      spark.readStream.format("graft-snapshot").option("path", src)
        .load()
        .writeStream.format("graft").option("path", dst)
        .outputMode("update")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft_sk3c2").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
  }
}
