package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-path join/aggregation strategies for skewed and co-located
  * workloads. The reference engine (single-node DuckDB) never faces
  * these; on a 1000-executor cluster they decide whether a job finishes.
  *
  * Three tools, in the order to reach for them:
  *   1. AQE (on by default in Spark 4): runtime skew-join splitting and
  *      partition coalescing — zero code, handles moderate skew.
  *   2. [[saltedAggregate]] / [[saltedJoin]]: explicit salting for
  *      pathological keys (a handful of keys holding most rows — the
  *      boilerplate-document / null-key / celebrity-user shape). AQE
  *      splits skewed *partitions*; salting splits skewed *keys*, which
  *      AQE cannot do for a single giant key inside one partition.
  *   3. Bucketing (see JoinOpsSpec): pre-shuffle both fact tables on
  *      the join key at write time, then every subsequent join on that
  *      key is shuffle-free — the right trade when a key is joined
  *      repeatedly (dim-fact stars, incremental dedup against a corpus).
  */
object JoinOps {

  /** Drops a managed table AND deletes any orphaned warehouse location
    * left by a previous session (a fresh session's catalog doesn't know
    * the table, so saveAsTable(overwrite) alone trips
    * LOCATION_ALREADY_EXISTS). Idempotent. */
  def resetManagedTable(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Per-row salt in [0, saltFactor): seeded `rand` so byte-identical
    * duplicate rows (exactly the hot-key shape salting exists for) still
    * spread across sub-keys — a whole-row hash would send every copy of
    * a duplicated row to the same reducer. Spark marks rand-bearing
    * stages indeterminate and replays them wholesale on partial stage
    * retry (SPARK-23207), so a retry cannot double-count; and because
    * ANY salt assignment yields the same final result here (partials
    * re-aggregate per key; the replicated join side carries every salt),
    * the assignment itself never needs to be reproducible. */
  def saltExpr(saltFactor: Int, seed: Long = 42L): Column =
    (rand(seed) * saltFactor).cast("int")

  /** Two-stage aggregation for skew-heavy group-bys: rows spread across
    * `saltFactor` sub-keys, partially aggregated per (key, salt), then
    * finally aggregated per key — the hot key's load fans out over
    * saltFactor reducers instead of melting one. Composable only for
    * algebraic aggregates: the caller passes partial and final
    * expression builders. The group key keeps its column name. */
  def saltedAggregate(df: DataFrame, key: String, saltFactor: Int,
      partial: Seq[Column], finalAgg: Seq[Column],
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", saltExpr(saltFactor, seed))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)

  /** Skew-proof inner equi-join: every row of the (small) `right` side is
    * replicated `saltFactor` times, each copy tagged with one salt value;
    * `left` rows pick a salt at random. The giant key's rows land on
    * saltFactor different reducers, each meeting its own replica of the
    * matching right rows. Costs saltFactor× the right side — use for a
    * dim-side join where the fact side has pathological keys and the dim
    * side is modest. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int, seed: Long = 42L): DataFrame = {
    val salted = left.withColumn("__salt",
      saltExpr(saltFactor, seed).cast("long"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
