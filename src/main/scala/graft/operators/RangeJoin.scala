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

  /** @param binWidth bin size in the units of the point/lo/hi columns */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
