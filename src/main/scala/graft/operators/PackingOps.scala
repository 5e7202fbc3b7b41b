package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example assembly operators: sequence packing and corpus
  * mixture resampling — the steps between a curated corpus and actual
  * pretraining batches.
  *
  * Both are formulated for the 100 TB shape: packing replaces the
  * single-partition global window a naive cumulative sum would need
  * with the classic two-pass distributed prefix sum (per-partition
  * partials, offsets computed on the #partitions-sized partials table,
  * broadcast back); mixing reduces every floating-point step to one
  * deterministic correctly-rounded kernel (sqrt) plus integer
  * arithmetic, so targets are bit-stable across engines, partitionings
  * and summation orders. */
object PackingOps {

  /** GPT-style concat-and-chunk sequence packing: documents are
    * concatenated in `idCol` order and the token stream is cut into
    * fixed `chunkLen`-token training sequences; each document reports
    * the chunk range [chunk_first, chunk_last] it lands in (a range
    * longer than one chunk = the document crosses a sequence boundary,
    * the packing-fragmentation signal).
    *
    * The global running offset is a prefix sum over a total order —
    * the textbook case where a naive `Window.orderBy(id)` collapses to
    * ONE partition and dies at scale. Instead: range-repartition by id
    * (so partition order == key order), per-partition running sums via
    * a pid-partitioned window, per-partition TOTALS aggregated to a
    * #partitions-row table whose exclusive prefix runs on a single
    * tiny partition (32 rows, not 32 billion), then broadcast back.
    * Output is invariant to the (sampled) range boundaries: offsets
    * are exact wherever the cut falls.
    *
    * Output: (doc_id, toks, gstart, chunk_first, chunk_last). */
  def packChunks(docs: DataFrame, idCol: String, tokCol: String,
      chunkLen: Int): DataFrame = {
    require(chunkLen > 0, "chunkLen must be positive")
    // materialized ONCE (localCheckpoint): the per-row branch and the
    // offsets branch must see the SAME pid assignment — two separate
    // repartitionByRange exchanges each sample their own boundaries,
    // and a boundary that lands differently between the branches would
    // silently shift every downstream offset. Materializing also cuts
    // the corpus scan count from two to one.
    val d = docs
      .select(col(idCol).as("doc_id"), col(tokCol).cast("long").as("toks"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // exclusive prefix over the tiny per-partition totals table; the
    // unpartitioned window is deliberate — it carries #partitions rows
    val offsets = d.groupBy("pid").agg(sum("toks").as("ptoks"))
      .withColumn("poff", coalesce(sum("ptoks").over(
        Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "poff")
    val inPart = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("prev_in_part", coalesce(sum("toks").over(inPart), lit(0L)))
      .join(broadcast(offsets), "pid")
      .withColumn("gstart", col("poff") + col("prev_in_part"))
      .select(col("doc_id"), col("toks"), col("gstart"),
        expr(s"gstart div $chunkLen").as("chunk_first"),
        expr(s"(gstart + greatest(toks, 1L) - 1) div $chunkLen")
          .as("chunk_last"))
  }

  /** Temperature-resampled corpus mixing (the XLM-R-style α-sampling
    * that up-weights low-resource slices): per `keyCol` slice with n
    * docs, sampling weight n^α (α = 0.5 here — i.e. sqrt, chosen
    * because sqrt is CORRECTLY ROUNDED by IEEE 754 in both the JVM and
    * DuckDB, unlike pow), target share weight/Σweights of the corpus.
    *
    * Every cross-engine float hazard is squeezed out: the weight is
    * quantized to an integer (round(sqrt(n)·10⁶) — one exact sqrt, one
    * exact double product, one half-away round, both engines agree
    * bit-for-bit), and from there share and target counts are PURE
    * integer arithmetic (`W·N div ΣW`), so the result cannot drift
    * with summation order or partitioning. Selection of the target
    * docs is deterministic content-keyed order (md5 of the id — the
    * same portable sampling key as q92), so the chosen SET, not just
    * its size, is pinned: kept_id_sum proves it.
    *
    * Output per slice: (key, n_docs, target_docs, kept_docs,
    * kept_id_sum). */
  def temperatureMix(docs: DataFrame, idCol: String, keyCol: String)
      : DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(keyCol).as("key"))
    val counts = d.groupBy("key").agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    // W·N overflows 64-bit once sqrt(n)·N_total crosses ~9.2e12 (a
    // 10-billion-doc corpus is past it), so the integer share runs in
    // 128-bit: DECIMAL(38,0) here, HUGEINT in the DuckDB oracle —
    // integral division floors identically in both
    val targets = counts
      .withColumn("target_docs", expr(
        """CAST(CAST(w AS DECIMAL(38,0)) *
          |  CAST(sum(n_docs) OVER () AS DECIMAL(38,0)) div
          |  CAST(sum(w) OVER () AS DECIMAL(38,0)) AS BIGINT)"""
          .stripMargin))
      .select(col("key"), col("n_docs"), col("target_docs"))
    val byHash = Window.partitionBy("key")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    d.withColumn("rk", row_number().over(byHash))
      .join(broadcast(targets), "key")
      .groupBy("key", "n_docs", "target_docs")
      .agg(sum(when(col("rk") <= col("target_docs"), 1L).otherwise(0L))
          .as("kept_docs"),
        coalesce(sum(when(col("rk") <= col("target_docs"),
          col("doc_id"))), lit(0L)).as("kept_id_sum"))
  }
}
