package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SnapshotOps

/** A/B probe: MERGE-ON-READ delete (commitDelete — writes O(matched
  * rows) of positions) vs COPY-ON-WRITE delete (commitRewrite with a
  * filtering update — rewrites O(touched files' bytes)) for a selective
  * delete on a large table, plus the read-side cost of carrying the DV.
  * Methodology: same sf1 lineitem slice committed twice (8 range files),
  * delete one order's ~7 rows (touches 1 file), wall-clock both verbs,
  * then count() the plain v1 read vs the DV-filtered latest read.
  * Results recorded in BASELINE.md (Round-11 measurements).
  *
  * Usage: runMain graft.MorAbProbe [parquetPath]
  */
object MorAbProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption
      .getOrElse("/root/repo/scaledata/sf1/lineitem.parquet")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("mor-ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(src)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
    def mk(): String = {
      val t = java.nio.file.Files.createTempDirectory("mor_ab")
        .toString + "/t"
      SnapshotOps.commitAppend(spark, t,
        li.repartitionByRange(8, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      t
    }
    val cond = col("l_orderkey") === 777L
    def time[T](f: => T): (T, Double) = {
      val s = System.nanoTime(); val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }
    val t1 = mk(); val t2 = mk()
    val (d1, morSec) = time(SnapshotOps.commitDelete(spark, t1, cond))
    // COW dual: update(matched) = drop them
    val (d2, cowSec) = time(SnapshotOps.commitRewrite(spark, t2, cond,
      _.limit(0)))
    val n1 = SnapshotOps.readLatest(spark, t1).count()
    val n2 = SnapshotOps.readLatest(spark, t2).count()
    val (_, plainRead) = time(SnapshotOps.readSnapshot(spark, t1, 1).count())
    val (_, dvRead) = time(SnapshotOps.readLatest(spark, t1).count())
    // the UPDATE duals on fresh tables
    val t3 = mk(); val t4 = mk()
    val bump: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("l_quantity", col("l_quantity") + lit(1.0))
    val (u1, morUpdSec) = time(SnapshotOps.commitUpdateMoR(spark, t3,
      cond, bump))
    val (u2, cowUpdSec) = time(SnapshotOps.commitRewrite(spark, t4,
      cond, bump))
    println(f"""{"mor_sec":$morSec%.2f,"cow_sec":$cowSec%.2f,""" +
      s""""mor_reused":${d1.reused},"cow_reused":${d2.reused},""" +
      s""""rows_mor":$n1,"rows_cow":$n2,""" +
      f""""read_plain_sec":$plainRead%.2f,"read_dv_sec":$dvRead%.2f,""" +
      f""""mor_upd_sec":$morUpdSec%.2f,"cow_upd_sec":$cowUpdSec%.2f,""" +
      s""""mor_upd_reused":${u1.reused},"cow_upd_reused":${u2.reused}}""")
    spark.stop()
  }
}
