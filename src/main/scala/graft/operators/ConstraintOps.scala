package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ-shaped
  * verb): a suite of constraints evaluates against a table and yields
  * one (constraint, violations, passed) row each — the validation gate
  * every ingestion pipeline runs before promoting a batch.
  *
  * Execution shape, not a per-constraint loop:
  *   - ALL row-local constraints (completeness, range, domain,
  *     cross-column) fold into ONE aggregate pass over the table —
  *     the Summarize discipline: n constraints cost one scan, their
  *     results unpivot from one row.
  *   - uniqueness costs its inherent key shuffle (count>1 groups);
  *   - referential integrity costs its inherent anti-join (broadcast
  *     when the parent side is dimension-sized).
  * Violation COUNTS (not booleans) ride in the result so a failing
  * batch is diagnosable from the report alone. */
object ConstraintOps {

  /** All row-local predicates in one aggregate pass, unpivoted to
    * (constraint, violations) rows via `stack`. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)])
      : DataFrame = {
    require(checks.nonEmpty, "no constraints given")
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val stacked = checks.map { case (name, _) => s"'$name', `$name`" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${checks.size}, $stacked) AS (constraint, violations)"))
  }

  /** Uniqueness of a key: violations = rows beyond the first per
    * duplicated key (0 ⇔ the key is unique). */
  def uniqueCheck(df: DataFrame, name: String, keyCols: Seq[String])
      : DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("constraint"), col("violations"))

  /** Referential integrity: violations = child rows whose `fkCol` has
    * no match in the parent's `pkCol` (broadcast anti-join when the
    * parent is dimension-sized). */
  def refCheck(child: DataFrame, fkCol: String, parent: DataFrame,
      pkCol: String, name: String): DataFrame =
    child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("constraint"), col("violations"))

  /** Runs a full suite and appends the pass verdict. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
}
