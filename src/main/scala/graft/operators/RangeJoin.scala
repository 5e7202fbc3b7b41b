package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without an equi-key — the join shape
  * Spark executes as BroadcastNestedLoopJoin (quadratic, OOM-prone at
  * scale) unless rewritten. DuckDB ships a specialized IEJoin for it;
  * the Spark-first equivalent is BINNING: intervals are exploded onto
  * the fixed-width bins they cover, points map to their single bin, and
  * the join becomes an equi-join on bin id + an exact containment
  * filter.
  *
  * Cost: intervals replicate by ceil(len/binWidth) (choose binWidth
  * near the typical interval length to keep replication ~2×); both
  * sides shuffle once on the bin id; the per-bin work is hash-join
  * local. A 100 TB point set against a large interval set stays a
  * shuffle-hash-join instead of a nested loop.
  */
object RangeJoin {

  /** @param binWidth bin size in the units of the point/lo/hi columns.
    *                  Pick it near the typical interval length: an
    *                  interval covers ceil(len/binWidth)+1 bins, and a
    *                  span over ~2^31 bins fails loudly at Spark's
    *                  sequence-length limit (sanitize outlier intervals
    *                  first rather than shrinking binWidth).
    *
    * `__bin` is a reserved working-column name; inputs must not carry it.
    * Inverted intervals (hi < lo) match nothing and are dropped before
    * the explode rather than replicated and filtered. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by pointInInterval")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
