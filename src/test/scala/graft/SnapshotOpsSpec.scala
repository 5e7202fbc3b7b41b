package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotOps

/** Commit-protocol semantics the SQL oracle can't see: atomic version
  * CAS, two-writer behaviour, file-level COW reuse, immutable history. */
class SnapshotOpsSpec extends SparkSpecBase {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString + "/t"

  test("tryPublish is a CAS on the version slot: second publisher of the " +
      "same version loses cleanly, wins the next") {
    val t = freshTable()
    assert(SnapshotOps.tryPublish(t, 1, Seq("/a.parquet")))
    assert(!SnapshotOps.tryPublish(t, 1, Seq("/b.parquet")))
    // the loser's data is untouched; rebasing onto v1 and taking v2 works
    assert(SnapshotOps.tryPublish(t, 2, Seq("/a.parquet", "/b.parquet")))
    assert(SnapshotOps.currentVersion(t) == 2)
    assert(SnapshotOps.snapshotFiles(t, 1) == Seq("/a.parquet"))
    assert(SnapshotOps.snapshotFiles(t, 2) ==
      Seq("/a.parquet", "/b.parquet"))
  }

  test("two concurrent appends: both land, versions are consecutive, no " +
      "rows lost or duplicated") {
    import spark.implicits._
    val t = freshTable()
    SnapshotOps.commitAppend(spark, t, Seq((0L, "base")).toDF("id", "tag"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(2)
    def writer(tag: String, ids: Seq[Long]) = Future {
      val df = ids.map(i => (i, tag)).toDF("id", "tag")
      gate.countDown(); gate.await() // line both writers up
      SnapshotOps.commitAppend(spark, t, df)
    }
    val (c1, c2) = (writer("w1", Seq(1L, 2L)), writer("w2", Seq(3L, 4L)))
    val r1 = Await.result(c1, 2.minutes)
    val r2 = Await.result(c2, 2.minutes)
    assert(Set(r1.version, r2.version) == Set(2, 3))
    assert(SnapshotOps.currentVersion(t) == 3)
    val rows = SnapshotOps.readLatest(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq(0L -> "base", 1L -> "w1", 2L -> "w1",
      3L -> "w2", 4L -> "w2"))
    // intermediate snapshot (the winner's) holds exactly base + winner
    val winner = if (r1.version == 2) "w1" else "w2"
    val v2tags = SnapshotOps.readSnapshot(spark, t, 2)
      .select("tag").distinct().collect().map(_.getString(0)).toSet
    assert(v2tags == Set("base", winner))
  }

  test("commitRewrite is copy-on-write at file granularity: untouched " +
      "files are reused byte-for-byte, history stays readable") {
    import spark.implicits._
    val t = freshTable()
    // two appends partitioned by group: 'a' rows and 'b' rows land in
    // different files
    SnapshotOps.commitAppend(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v")
        .repartitionByRange(2, col("grp")))
    SnapshotOps.commitAppend(spark, t,
      Seq((3L, "a", 30L), (4L, "b", 40L)).toDF("id", "grp", "v")
        .repartitionByRange(2, col("grp")))
    val v2files = SnapshotOps.snapshotFiles(t, 2)
    val c = SnapshotOps.commitRewrite(spark, t, col("grp") === "a",
      _.withColumn("v", col("v") + 1))
    assert(c.version == 3)
    assert(c.reused >= 1, s"expected byte-for-byte reuse, got $c")
    assert(c.written >= 1)
    val v3files = SnapshotOps.snapshotFiles(t, 3)
    // the reused paths are literally the old paths (no copy happened)
    assert(v3files.toSet.intersect(v2files.toSet).size == c.reused)
    // content: only grp=a rows changed
    val v3 = SnapshotOps.readSnapshot(spark, t, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(v3 == Seq((1L, "a", 11L), (2L, "b", 20L), (3L, "a", 31L),
      (4L, "b", 40L)))
    // time travel: v1/v2 unchanged after the rewrite (immutable files)
    val v1 = SnapshotOps.readSnapshot(spark, t, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(v1 == Seq(1L -> 10L, 2L -> 20L))
    val v2 = SnapshotOps.readSnapshot(spark, t, 2)
      .agg(sum("v")).head().getLong(0)
    assert(v2 == 100L)
  }

  test("commitCompact collapses files transactionally; vacuum drops old " +
      "manifests and exactly the newly-orphaned data files") {
    import spark.implicits._
    val t = freshTable()
    SnapshotOps.commitAppend(spark, t,
      (1L to 40L).map(i => (i, i * 10)).toDF("id", "v").repartition(8))
    SnapshotOps.commitAppend(spark, t,
      (41L to 80L).map(i => (i, i * 10)).toDF("id", "v").repartition(8))
    assert(SnapshotOps.snapshotFiles(t, 2).size >= 8)
    val c = SnapshotOps.commitCompact(spark, t, nFiles = 2)
    assert(c.version == 3 && c.written <= 2)
    assert(SnapshotOps.snapshotFiles(t, 3).size <= 2)
    // identical content through the compaction
    def sig(v: Int) = SnapshotOps.readSnapshot(spark, t, v)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(sig(3) == sig(2))
    // vacuum to the last 1 version: v1/v2 manifests go; their
    // fragmented files (referenced by NO retained manifest) go; the
    // compacted files stay readable
    val before = SnapshotOps.snapshotFiles(t, 2).size
    val (droppedManifests, deletedFiles) = SnapshotOps.vacuum(t, 1)
    assert(droppedManifests == 2)
    assert(deletedFiles == before, // v1 files ⊂ v2 files (append reuse)
      s"expected $before orphans deleted, got $deletedFiles")
    assert(SnapshotOps.currentVersion(t) == 3)
    assert(SnapshotOps.readLatest(spark, t).count() == 80)
    // dropped snapshots are really gone
    assertThrows[Exception] { SnapshotOps.snapshotFiles(t, 2) }
  }

  test("readSnapshot(0) is the empty table; commitRewrite on it refuses") {
    import spark.implicits._
    val t = freshTable()
    assert(SnapshotOps.currentVersion(t) == 0)
    assert(SnapshotOps.readSnapshot(spark, t, 0,
      Seq((1L, "x")).toDF("id", "tag").schema).collect().isEmpty)
    assertThrows[IllegalArgumentException] {
      SnapshotOps.commitRewrite(spark, t, lit(true), identity)
    }
  }
}
