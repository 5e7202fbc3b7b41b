package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.SnapshotOps

/** Structured-streaming SINK into a committed snapshot table — the
  * write-side dual of [[SnapshotStreamSource]], and the native form of
  * the foreachBatch idiom the exactly-once entries (q240/q259) spell
  * out by hand: `df.writeStream.format("graft")` lands every
  * micro-batch as ONE committed version through the snapshot protocol,
  * idempotent per epoch via the same `#txn.<stream>:<batchId>`
  * watermark (a replayed batch — foreachBatch-style at-least-once
  * delivery, query restarts — skips before reading or writing a
  * byte).
  *
  * Output-mode → commit-verb routing (the Delta sink's shape):
  *   - Append        → [[SnapshotOps.commitAppend]]; first batch
  *                     creates the table
  *   - Complete      → [[SnapshotOps.commitOverwrite]] — the batch's
  *                     full aggregation state replaces the table,
  *                     history spans every epoch
  *   - Update        → [[SnapshotOps.commitMerge]] keyed on the
  *                     `mergeKeys` option — changed rows upsert
  *
  * The micro-batch frame's plan is re-tagged batch (same lazy RDD,
  * rows stay distributed — no driver materialization) before the
  * commit verb runs; `copy()` guards against InternalRow reuse across
  * the RDD boundary. Hidden partitioning, manifest stats and the
  * maintenance debt policy all apply — they live in the verbs, not
  * the caller. */
class SnapshotStreamSink(spark: SparkSession, tableDir: String,
    streamId: String, mode: OutputMode, mergeKeys: Seq[String],
    statsCols: Seq[String], bloomCols: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch: DataFrame = spark.internalCreateDataFrame(
      data.queryExecution.toRdd.map(_.copy()), data.schema,
      isStreaming = false)
    val txn = Some((streamId, batchId))
    if (mode == OutputMode.Complete())
      SnapshotOps.commitOverwrite(spark, tableDir, batch,
        statsCols = statsCols, bloomCols = bloomCols, txn = txn)
    else if (mode == OutputMode.Update())
      SnapshotOps.commitMerge(spark, tableDir, batch, mergeKeys,
        txn = txn)
    else
      SnapshotOps.commitAppend(spark, tableDir, batch,
        statsCols = statsCols, bloomCols = bloomCols, txn = txn)
  }

  override def toString: String = s"SnapshotStreamSink[$tableDir]"
}
