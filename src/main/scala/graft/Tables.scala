package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated testdata tables (TESTDATA.md) from an sf
  * directory and registers them as temp views.
  *
  * Scale notes (100 TB design): each table is a plain parquet read — at
  * cluster scale these become multi-file scans where Spark's
  * FileSourceScanExec handles split planning, column pruning and predicate
  * pushdown for free. Nothing here collects to the driver. Dimension tables
  * (region/nation/supplier/part/customer) stay small relative to the fact
  * tables (lineitem/orders/events) at every sf, so queries broadcast them
  * explicitly (see SparkEntry).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small-side tables safe to broadcast at ANY scale factor: they grow
    * sublinearly (region/nation are fixed; supplier/part/customer grow with
    * sf but stay orders of magnitude under the fact tables). */
  val broadcastable: Set[String] =
    Set("region", "nation", "supplier", "part", "customer")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects outright; read it as raw nanos (legacy conf) and convert to a
    // micros timestamp in the plan. The cast is codegen'd arithmetic on the
    // scan output — no UDF, pushdown/pruning on the other columns unaffected.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Tables whose single-file testdata arrives as ONE parquet row group —
    * an unsplittable scan, so every downstream op starts single-threaded.
    * These get repartitioned to the session's parallelism and cached (the
    * buffer-pool role). On a real multi-file corpus the scan already
    * yields enough splits and this is skipped (partitions >= parallelism). */
  private val hot: Set[String] =
    Set("lineitem", "orders", "events", "documents", "embeddings")

  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** Registers every table as a temp view in the session, so queries can
    * be written in plain SQL. Idempotent and memoized per session:
    * repeat calls for the SAME sf dir skip the 10 parquet footer reads,
    * and hot tables stay cached across queries. The memo records which
    * dir the session currently points at — a call with a different dir
    * re-registers everything (view existence alone can't tell, since the
    * old dir's views are still present and would silently serve stale
    * data). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val id = System.identityHashCode(spark)
    // memo alone isn't enough: other components (GoldSuite) may drop the
    // session's temp views between calls — re-register unless all views
    // are actually present (cheap driver-side catalog lookups)
    if (sfDir == registeredFor.get(id) &&
      names.forall(spark.catalog.tableExists)) return
    // the whole remove→rebind→record sequence runs under ONE global
    // lock (the memo map's monitor): two threads registering different
    // dirs on one session must not interleave (views mixed between dirs
    // with a single dir memoized). Registration is rare and idempotent,
    // so serializing unrelated sessions too is an accepted cost.
    registeredFor.synchronized {
      if (sfDir == registeredFor.get(id) &&
        names.forall(spark.catalog.tableExists)) return
      // memo is recorded only after ALL views rebind: a mid-loop load
      // failure must not leave the session claiming the new dir while
      // some views still serve the old one
      registeredFor.remove(id)
      val par = spark.sparkContext.defaultParallelism
      names.foreach { n =>
        // release the previous dir's cached blocks before rebinding the view
        if (spark.catalog.tableExists(n))
          scala.util.Try(spark.table(n).unpersist())
        val df0 = load(spark, sfDir, n)
        val df =
          if (hot(n) && df0.rdd.getNumPartitions < par)
            df0.repartition(par).cache()
          else df0
        df.createOrReplaceTempView(n)
      }
      registeredFor.put(id, sfDir)
    }
  }
}
