package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single latest right row
  * with `right.time <= left.time` on the same key (DuckDB `ASOF JOIN`;
  * the canonical time-series enrichment: trades←quotes, events←prices).
  *
  * Spark-first formulation: no range probe and no per-row subquery —
  * both sides are tagged and UNIONed, then ONE window pass per key
  * carries the most recent right-side payload forward
  * (`last(_, ignoreNulls)` over rows-unbounded-preceding), and left rows
  * are kept with their carried payload. Cost: one shuffle on the key
  * (the union), one sort per partition (the window) — the same shape as
  * any windowed aggregation, scaling to arbitrarily long histories
  * without the quadratic blowup of an inequality join. At equal
  * timestamps the right row sorts first, giving `<=` (inclusive)
  * semantics like DuckDB.
  *
  * Inner semantics: left rows with no prior right row are dropped
  * (DuckDB ASOF JOIN default); pass `keepUnmatched = true` for the
  * LEFT OUTER variant.
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried onto each left row
    *                  (must not collide with left column names) */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      keepUnmatched: Boolean = false): DataFrame =
    asofImpl(left, right, keyCol, leftTime, rightTime, valueCols,
      keepUnmatched, forward = false)

  /** Forward as-of join — for each left row, the single EARLIEST right
    * row with `right.time >= left.time` on the same key (DuckDB
    * `ASOF JOIN ... ON l.t <= r.t`; the "next event after" enrichment:
    * click→next purchase, alert→next deploy). Same cost shape as the
    * backward variant: one union shuffle + one window pass. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      keepUnmatched: Boolean = false): DataFrame =
    asofImpl(left, right, keyCol, leftTime, rightTime, valueCols,
      keepUnmatched, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      keepUnmatched: Boolean, forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val payloadType = StructType(valueCols.map(c => right.schema(c)))
    val lvalType = StructType(left.schema.fields)
    // a NULL right timestamp can never satisfy left.t >= right.t (SQL
    // comparison semantics; DuckDB ASOF agrees) — drop it before tagging
    // or it would sort first (nulls-first) and fabricate matches
    val r = right.where(col(rightTime).isNotNull)
      .select(right(keyCol).as("__k"),
        right(rightTime).as("__t"), lit(0).as("__side"),
        struct(valueCols.map(right(_)): _*).as("__rval"),
        lit(null).cast(lvalType).as("__lval"))
    val l = left.select(left(keyCol).as("__k"),
      left(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__rval"),
      struct(left.columns.map(left(_)): _*).as("__lval"))

    val unioned = r.unionByName(l)
    // __rval as the final sort key totally orders right-side ties on
    // (key, t): which payload wins is arbitrary (as in DuckDB) but
    // DETERMINISTIC across runs/partitionings. Left rows all carry a
    // null __rval, so their relative order stays irrelevant.
    // Forward = the same scan over reversed time (descending __t):
    // "latest right at-or-before" becomes "earliest right at-or-after";
    // __side still puts the right row first at equal timestamps, which
    // keeps the bound inclusive in both directions.
    val tKey = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy("__k")
      .orderBy(tKey, col("__side").asc, col("__rval").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__carry", last(col("__rval"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val matched =
      if (keepUnmatched) carried else carried.where(col("__carry").isNotNull)
    matched.select(
      left.columns.map(c => col("__lval").getField(c).as(c)) ++
        valueCols.map(c => col("__carry").getField(c).as(c)): _*)
  }
}
