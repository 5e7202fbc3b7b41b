package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SnapshotOps

/** Equality-delete cost probe (the DvScaleProbe dual, r13): same
  * 2M-row table, the same 1% of rows deleted two ways — positional DV
  * vs equality delete — measuring BOTH sides of the trade the Iceberg
  * v2 design makes:
  *
  *  - READ tax: a DV subtracts by (file, position) — no key columns
  *    touched; an eq-delete anti-joins broadcast key tuples out of
  *    every older unit. Expect eq ≥ DV at equal selectivity (the
  *    anti-join hashes the key column), both within a small factor of
  *    the clean baseline.
  *  - COMMIT cost: the eq shape's whole point — commitDelete must
  *    SCAN the table for matching positions (O(table)), while
  *    commitDeleteByKey writes only the key list (O(keys), zero data
  *    files opened).
  *
  * Timing: median of 3 after one warm-up read; run on a quiet host
  * (`sbt "runMain graft.EqScaleProbe"`). Results recorded in
  * BASELINE.md Round 13.
  */
object EqScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 2000000L
    def freshTable(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"eqprobe_$tag")
        .toString + "/t"
    def build(t: String): Unit =
      SnapshotOps.commitAppend(spark, t,
        spark.range(n).select(col("id"),
          (col("id") % 97).cast("int").as("k"),
          md5(col("id").cast("string")).as("payload"))
          .repartition(8),
        statsCols = Seq("id"))
    def timeRead(t: String, expect: Long): Double = {
      SnapshotOps.readLatest(spark, t).count() // warm-up
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = SnapshotOps.readLatest(spark, t).count()
        assert(c == expect, s"$c != $expect")
        (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(1)
    }
    val base = freshTable("base"); build(base)
    println(f"baseline read (no delete):      ${timeRead(base, n)}%.0f ms")
    val dv = freshTable("dv"); build(dv)
    SnapshotOps.commitDelete(spark, dv, col("id") % 100 === 0L)
    println(f"DV read (1%% positional):        ${timeRead(dv, n - n / 100)}%.0f ms")
    val eq = freshTable("eq"); build(eq)
    SnapshotOps.commitDeleteByKey(spark, eq,
      spark.range(n).where(col("id") % 100 === 0L).select(col("id")))
    println(f"EQ read (1%% by key):            ${timeRead(eq, n - n / 100)}%.0f ms")
    // commit-cost duel on equally-sized deletes (~20k keys each)
    val t0 = System.nanoTime()
    SnapshotOps.commitDelete(spark, base, col("id") % 101 === 7L)
    println(f"DV delete commit (scans table): ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    val t1 = System.nanoTime()
    SnapshotOps.commitDeleteByKey(spark, eq,
      spark.range(n / 101).select((col("id") * 101 + 7).as("id")))
    println(f"EQ delete commit (keys only):   ${(System.nanoTime() - t1) / 1e6}%.0f ms")
    // stacked-commit probe (r15): 64 un-compacted key-delete commits.
    // The read plan flattens same-signature deletes into ONE union
    // anti-join per group, so the read tax must stay flat in delete
    // count (pre-r15 it chained one join per commit).
    val stack = freshTable("stack"); build(stack)
    var live = n
    Seq(4, 16, 64).foldLeft(0) { (done, upTo) =>
      (done until upTo).foreach { i =>
        SnapshotOps.commitDeleteByKey(spark, stack,
          spark.range(100).select((col("id") + i * 1000L).as("id")))
      }
      live = n - upTo * 100L
      println(f"EQ read after $upTo%2d stacked commits: " +
        f"${timeRead(stack, live)}%.0f ms")
      upTo
    }
    spark.stop()
  }
}
