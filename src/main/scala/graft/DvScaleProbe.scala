package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SnapshotOps

/** Measured read tax of the three deletion-vector application tiers
  * (SnapshotOps.readFilesDv): literal per-file `row_index NOT IN` set,
  * broadcast anti-join, shuffle anti-join. The tier boundaries
  * (DvLiteralRows = 64k, DvBroadcastRows = 1M) were chosen by
  * argument in r11; this probe pins them with numbers at two DV sizes
  * — ~50k positions (the selective-delete regime, where the literal
  * tier should win) and ~2M positions (the compaction-debt regime a
  * 100 TB table with deferred maintenance carries, where only the
  * shuffle tier is viable at real scale: a 2M-row DV broadcast is
  * already tens of MB per executor, and the literal tier's driver
  * collect + giant InSet stops being a filter at all).
  *
  * Method: one snapshot table per size, MOR delete, then time
  * `readLatest().count()` with the tier forced via the injectable
  * thresholds ([[SnapshotOps.withDvThresholds]]); auto-broadcast
  * disabled so the planner cannot un-force the shuffle tier. Median
  * of 3 after one warm-up. Emits one JSON line per (size, tier);
  * recorded in BASELINE.md (round 12).
  */
object DvScaleProbe {
  private def timeMs(reps: Int)(body: => Unit): Double = {
    body // warm-up (codegen + file listing)
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }.sorted
    ts(ts.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def build(n: Long, deleteMod: Long): (String, Long) = {
      val t = java.nio.file.Files.createTempDirectory("dv_probe")
        .toString + "/t"
      SnapshotOps.commitAppend(spark, t,
        spark.range(1, n + 1).select(col("id"), (col("id") % 97).as("v"))
          .repartitionByRange(8, col("id")), statsCols = Seq("id"))
      SnapshotOps.commitDelete(spark, t, col("id") % deleteMod === 0)
      val (_, dvRows) = SnapshotOps.deleteStats(t, 2)
      (t, dvRows)
    }

    val Huge = Long.MaxValue
    def probe(label: String, t: String, dvRows: Long,
        tiers: Seq[(String, (Long, Long))]): Unit =
      tiers.foreach { case (tier, (lit, bc)) =>
        // forcing "literal" must also lift the DvLiteralFiles cap: the
        // sweep's mod-deletes span all 8 files, and with the production
        // cap (4) the literal branch would silently fall through to the
        // broadcast anti-join — the probe would measure broadcast twice
        val fileCap = if (tier == "literal") Int.MaxValue else 0
        val ms = SnapshotOps.withDvThresholds(lit, bc, fileCap) {
          timeMs(3)(SnapshotOps.readLatest(spark, t).count())
        }
        println(s"""{"probe":"dv_read_tax","size":"$label",""" +
          s""""dv_rows":$dvRows,"tier":"$tier","median_ms":$ms}""")
      }

    // literal-vs-broadcast boundary sweep: where does the literal
    // InSet stop beating the broadcast build?
    Seq(("1k", 400000L, 400L), ("8k", 400000L, 50L),
        ("50k", 400000L, 8L)).foreach { case (label, n, mod) =>
      val (t, dv) = build(n, mod)
      probe(label, t, dv, Seq(
        "literal" -> ((Huge, Huge)),
        "broadcast" -> ((0L, Huge)),
        "shuffle" -> ((0L, 0L))))
    }

    // the literal tier's design case: a SELECTIVE delete whose DV
    // names one file of many (bloom scoping leaves 7 of 8 files on
    // the clean single-scan path)
    {
      val t = java.nio.file.Files.createTempDirectory("dv_probe")
        .toString + "/t"
      SnapshotOps.commitAppend(spark, t,
        spark.range(1, 400001L).select(col("id"), (col("id") % 97).as("v"))
          .repartitionByRange(8, col("id")), statsCols = Seq("id"))
      SnapshotOps.commitDelete(spark, t,
        col("id") >= 100000L && col("id") < 102000L) // one file's range
      val (_, dvRows) = SnapshotOps.deleteStats(t, 2)
      probe("2k-selective", t, dvRows, Seq(
        "literal" -> ((Huge, Huge)),
        "broadcast" -> ((0L, Huge)),
        "shuffle" -> ((0L, 0L))))
    }

    // ~2M positions: compaction debt — literal is excluded by design
    // (a 2M-long driver InSet per DV'd file is not a filter), so the
    // measured question is broadcast vs shuffle
    val (t2, dv2) = build(4000000L, 2) // 2M deleted
    probe("2M", t2, dv2, Seq(
      "broadcast" -> ((0L, Huge)),
      "shuffle" -> ((0L, 0L))))

    spark.stop()
  }
}
