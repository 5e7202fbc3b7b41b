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
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    // generations (which Spark's vectorized reader rejects outright — the
    // legacy conf reads it as raw nanos LongType) and TIMESTAMP(MICROS,
    // isAdjustedToUTC=0) in others (arrives as TIMESTAMP_NTZ). Dispatch on
    // the type the scan actually produced instead of hardcoding one
    // physical encoding; every branch is codegen'd arithmetic/cast on the
    // scan output — no UDF, pushdown/pruning on other columns unaffected.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalizes `events.ts` to TimestampType whatever physical encoding the
    * scan produced: TIMESTAMP(NANOS) arrives as raw-nanos LongType (under
    * the legacy nanosAsLong conf), TIMESTAMP(MICROS, isAdjustedToUTC=0) as
    * TIMESTAMP_NTZ, TIMESTAMP(MICROS, utc) as TimestampType already.
    * Dispatching on the loaded type (not hardcoding one encoding) is what
    * lets the engine survive a testdata regeneration. Every branch is
    * codegen'd arithmetic/cast on the scan output — no UDF; pushdown and
    * pruning on other columns unaffected. Works on batch and streaming
    * DataFrames alike (use via `.transform(Tables.normalizeEventTs)`). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long (legacy conf) → micros timestamp
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros, no tz: align to session-tz type
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already TIMESTAMP — no-op
    }
  }

  /** Tables whose single-file testdata arrives as ONE parquet row group —
    * an unsplittable scan, so every downstream op starts single-threaded.
    * These get repartitioned to the session's parallelism and cached (the
    * buffer-pool role). On a real multi-file corpus the scan already
    * yields enough splits and this is skipped (partitions >= parallelism). */
  private val hot: Set[String] =
    Set("lineitem", "orders", "events", "documents", "embeddings")

  /** Per-session memo: (sf dir, the subset of `names` that actually
    * registered). Tracking the subset (not just the dir) keeps the memo
    * honest under degraded registration — a table whose load failed stays
    * un-memoized-for without forcing every later prep to re-read all ten
    * parquet footers. */
  private val registeredFor =
    new java.util.concurrent.ConcurrentHashMap[Int, (String, Seq[String])]()

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
    // that registered last time are actually present (cheap driver-side
    // catalog lookups)
    // a full hit needs ALL tables registered and present: a degraded
    // subset (one load failed last time — e.g. testdata caught
    // mid-regeneration) must NOT memo-stick for the whole session; the
    // retry below reloads just the missing tables (one footer read
    // each), leaving the surviving views untouched
    def memoHit: Boolean = registeredFor.get(id) match {
      case (dir, regd) if dir == sfDir =>
        regd.size == names.size && regd.forall(spark.catalog.tableExists)
      case _ => false
    }
    if (memoHit) return
    // the whole remove→rebind→record sequence runs under ONE global
    // lock (the memo map's monitor): two threads registering different
    // dirs on one session must not interleave (views mixed between dirs
    // with a single dir memoized). Registration is rare and idempotent,
    // so serializing unrelated sessions too is an accepted cost.
    registeredFor.synchronized {
      if (memoHit) return
      // same-dir partial state (degraded registration or views dropped
      // by another component): keep what's still bound and reload only
      // the rest. A dir CHANGE keeps nothing — the old dir's views
      // would silently serve stale data.
      val keep: Seq[String] = registeredFor.get(id) match {
        case (dir, regd) if dir == sfDir =>
          regd.filter(spark.catalog.tableExists)
        case _ => Seq.empty
      }
      // memo is recorded only after ALL views rebind: a mid-loop load
      // failure must not leave the session claiming the new dir while
      // some views still serve the old one
      registeredFor.remove(id)
      val par = spark.sparkContext.defaultParallelism
      // a single table's load failure (e.g. a testdata format change the
      // loader doesn't yet handle) must degrade to per-query "table not
      // found" errors for queries touching THAT table — not kill every
      // entry in the catalog. Log it loudly, register the rest.
      val registered = keep ++ names.filterNot(keep.contains).flatMap { n =>
        // release the previous dir's cached blocks before rebinding the view
        if (spark.catalog.tableExists(n))
          scala.util.Try(spark.table(n).unpersist())
        try {
          val df0 = load(spark, sfDir, n)
          val df =
            if (hot(n) && df0.rdd.getNumPartitions < par)
              df0.repartition(par).cache()
            else df0
          df.createOrReplaceTempView(n)
          Some(n)
        } catch { case scala.util.control.NonFatal(e) =>
          // drop any stale view so queries fail with "not found", never
          // silently serve the previous dir's data
          scala.util.Try(spark.catalog.dropTempView(n))
          System.err.println(s"[tables] load failed for $n at $sfDir: ${e.getMessage}")
          None
        }
      }
      registeredFor.put(id, (sfDir, registered))
    }
  }
}
