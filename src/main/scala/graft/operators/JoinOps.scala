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
  *   3. Bucketing (see BucketedOpsSpec): pre-shuffle both fact tables on
  *      the join key at write time, then every subsequent join on that
  *      key is shuffle-free — the right trade when a key is joined
  *      repeatedly (dim-fact stars, incremental dedup against a corpus).
  */
object JoinOps {

  /** Two-stage aggregation for skew-heavy group-bys: rows are spread
    * across `saltFactor` sub-keys (deterministic hash of the whole row —
    * no rand(), so retried tasks don't double-count), partially
    * aggregated per (key, salt), then finally aggregated per key. The
    * hot key's load fans out over saltFactor reducers instead of melting
    * one. Composable only for algebraic aggregates — the caller passes
    * partial and final expression builders.
    */
  def saltedAggregate(df: DataFrame, key: Column, saltFactor: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)

  /** Skew-proof inner equi-join: every row of the (small) `right` side is
    * replicated `saltFactor` times, each copy tagged with one salt value;
    * `left` rows pick a deterministic salt. The giant key's rows land on
    * saltFactor different reducers, each meeting its own replica of the
    * matching right rows. Costs saltFactor× the right side — use for a
    * dim-side join where the fact side has pathological keys and the dim
    * side is modest. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
