package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into `private[sql]` plan surgery for fixpoint loops.
  *
  * `Dataset.localCheckpoint` snapshots the child plan's estimated
  * statistics into the resulting `LogicalRDD` (`originStats`), so a
  * plan built over checkpoints inherits them. In an ITERATED loop the
  * estimates compound: round k's join estimate multiplies round k-1's
  * snapshots, so the sizeInBytes BigInt roughly squares per round —
  * by round ~15 of a chain-graph fixpoint the driver spends minutes in
  * BigInteger.multiply (Karatsuba/ToomCook frames) inside stats
  * derivation, before any job runs. Stripping `originStats` after each
  * checkpoint resets every round to the default leaf estimate, keeping
  * planning O(plan size) forever. The materialized RDD, partitioning
  * and ordering are untouched — only the estimate metadata goes. */
object PlanBridge {
  def freshStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        Dataset.ofRows(df.sparkSession.asInstanceOf[SparkSession],
          l.copy()(df.sparkSession.asInstanceOf[SparkSession], None, None))
      case _ => df
    }
}
