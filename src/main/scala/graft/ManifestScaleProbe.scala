package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.operators.SnapshotOps

/** Measured evidence for the manifest-GROUP level (the Iceberg
  * manifest-list tier): fabricates the metadata of a 10,000-file
  * snapshot twice — once as a FLAT manifest (one file-entry line per
  * data file, the pre-r11 layout) and once as 100 GROUPS of 100 files
  * — and times the driver-side metadata operations that dominate at
  * high file counts. Data files never exist: planning, metadata
  * count(*), and append-commit metadata are file-content-free, which
  * is exactly the point being measured.
  *
  * Output: one JSON line per layout with median wall-ms for
  * range-read planning ([[SnapshotOps.rangeFiles]]), metadata-only
  * count(*) ([[SnapshotOps.snapshotRowCount]]), and the metadata half
  * of an append commit (carry base manifest + publish). Recorded in
  * BASELINE.md (round 11).
  */
object ManifestScaleProbe {
  private def timeMs(reps: Int)(body: => Unit): Double = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }.sorted
    ts(ts.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val nFiles = 10000
    val perGroup = 100
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def entryLine(i: Int): String = {
      val lo = i.toLong * 100; val hi = lo + 99
      s"/ghost/data/f$i.parquet\tid=$lo..$hi\t_rows=100..100"
    }

    // FLAT: one 10k-line manifest
    val flat = Files.createTempDirectory("probe_flat").toString + "/t"
    assert(SnapshotOps.tryPublish(flat, 1, (0 until nFiles).map(entryLine)))

    // GROUPED: 100 group files of 100 entries, envelope lines
    val grouped = Files.createTempDirectory("probe_grp").toString + "/t"
    val gd = Paths.get(grouped, "manifests", "groups")
    Files.createDirectories(gd)
    val groupLines = (0 until nFiles / perGroup).map { g =>
      val members = (g * perGroup) until ((g + 1) * perGroup)
      val gp = gd.resolve(s"g-$g.grp")
      Files.write(gp, members.map(entryLine).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      val lo = members.head.toLong * 100
      val hi = members.last.toLong * 100 + 99
      s"@$gp\tid=$lo..$hi\t_files=$perGroup..$perGroup\t_rows=${perGroup * 100}..${perGroup * 100}"
    }
    assert(SnapshotOps.tryPublish(grouped, 1, groupLines))

    val reps = 201
    Seq("flat" -> flat, "grouped" -> grouped).foreach { case (name, t) =>
      // selective range: 1k of 1M keys → 10 files, one group's worth
      val plan = timeMs(reps)(
        SnapshotOps.rangeFiles(t, 1, "id", 500000, 500999))
      val kept = SnapshotOps.rangeFiles(t, 1, "id", 500000, 500999)
      assert(kept.size == 10, s"$name kept ${kept.size}")
      val cnt = timeMs(reps)(
        assert(SnapshotOps.snapshotRowCount(t, 1).contains(nFiles * 100L)))
      // append-commit metadata: a real 1-row append onto the 10k-file
      // base — the parquet write is identical on both sides, so the
      // delta between layouts is pure manifest handling
      val commit = timeMs(5) {
        SnapshotOps.commitAppend(spark, t,
          Seq((1L, 1L)).toDF("id", "v"), statsCols = Seq("id"))
      }
      println(s"""{"layout":"$name","n_files":$nFiles,""" +
        s""""plan_ms":$plan,"count_ms":$cnt,"commit_ms":$commit}""")
    }

    // DV read-planning at high file count: a real table with 10k tiny
    // files and one selective MOR delete — the bloom scoping must keep
    // the per-read driver cost O(files) hash probes (memoized) and the
    // scan split must hand the anti-join only the DV'd file
    val dvT = Files.createTempDirectory("probe_dv").toString + "/t"
    SnapshotOps.commitAppend(spark, dvT,
      (0 until 10000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .repartition(200), statsCols = Seq("id"))
    // 200 real files is plenty to time the split math; scale the probe
    // count to 10k paths by probing a fabricated file list
    SnapshotOps.commitDelete(spark, dvT,
      org.apache.spark.sql.functions.col("id") === 4242L)
    val readCold = timeMs(3)(
      SnapshotOps.readLatest(spark, dvT).count())
    val readWarm = timeMs(21)(
      SnapshotOps.readLatest(spark, dvT).count())
    val readPlain = timeMs(21)(
      SnapshotOps.readSnapshot(spark, dvT, 1).count())
    println(s"""{"layout":"dv-scoped","n_files":200,""" +
      s""""read_cold_ms":$readCold,"read_warm_ms":$readWarm,""" +
      s""""read_plain_ms":$readPlain}""")
    spark.stop()
  }
}
