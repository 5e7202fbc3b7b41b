package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Public face of the snapshot-table streaming SOURCE
  * ([[org.apache.spark.sql.graft.SnapshotStreamSource]]) — subscribe
  * to a committed snapshot table and receive each append-span as a
  * micro-batch. This closes the table-format loop: q240/q255/q259
  * built the streaming WRITE side (txn append, governed publish,
  * CDC upsert); this is the READ side (Delta readStream / Iceberg
  * incremental-scan streaming).
  *
  * Semantics (all inherited from the batch incremental read,
  * [[graft.operators.SnapshotOps.readAppendsSince]], which each batch
  * IS):
  *  - offsets are table versions; a batch covers (fromV, toV];
  *  - deletion vectors of `toV` apply, so rows already deleted at the
  *    batch's end version never surface;
  *  - non-append spans (compaction, COW rewrite, MOR delete/update of
  *    pre-span rows) fail the batch loudly with the snapshotDiff
  *    pointer — never silently wrong rows;
  *  - progress lives in the query's own checkpoint offset log, so a
  *    restart resumes exactly after the last committed version and a
  *    replayed epoch re-reads the identical immutable files.
  */
object SnapshotStream {

  /** `spark.readStream` over a committed snapshot table.
    * `maxRowsPerBatch` adds row-capped admission control (manifest
    * metadata only; the first pending version always admits). */
  def readAppendsStream(spark: SparkSession, tableDir: String,
      startingVersion: Int = 0, maxVersionsPerBatch: Int = 0,
      maxRowsPerBatch: Long = 0L): DataFrame =
    stream(spark, tableDir, startingVersion, maxVersionsPerBatch,
      "appends", maxRowsPerBatch)

  /** The CHANGE FEED stream (Delta readChangeFeed analogue): each
    * micro-batch is [[graft.operators.SnapshotOps.snapshotDiff]] over
    * its version span — the table columns plus a `change_type` tag
    * (`insert`/`delete`). Rewrite spans are legal here: a compaction
    * nets to zero rows, a COW update to delete+insert pairs, a MOR
    * delete to delete rows. Net-applying every batch in order
    * reconstructs the table's visible content exactly — the property
    * q263 gates against the batch diff oracle. */
  def readChangeFeed(spark: SparkSession, tableDir: String,
      startingVersion: Int = 0, maxVersionsPerBatch: Int = 0,
      maxRowsPerBatch: Long = 0L): DataFrame =
    stream(spark, tableDir, startingVersion, maxVersionsPerBatch,
      "diff", maxRowsPerBatch)

  private def stream(spark: SparkSession, tableDir: String,
      startingVersion: Int, maxVersionsPerBatch: Int,
      mode: String, maxRowsPerBatch: Long = 0L): DataFrame =
    spark.readStream.format("graft-snapshot")
      .option("path", tableDir)
      .option("startingVersion", startingVersion.toString)
      .option("maxVersionsPerBatch", maxVersionsPerBatch.toString)
      .option("maxRowsPerBatch", maxRowsPerBatch.toString)
      .option("mode", mode)
      .load()

  /** One AvailableNow drain pass: every span committed before the call
    * lands in `onBatch` (in batch order), then the query stops. The
    * checkpoint carries progress across calls — calling again after
    * more commits drains only the new spans. Test/measurement harness
    * for the source; production subscribers attach their own sink. */
  def drainAvailable(spark: SparkSession, tableDir: String,
      checkpoint: String, maxVersionsPerBatch: Int = 0,
      mode: String = "appends", maxRowsPerBatch: Long = 0L)
      (onBatch: (Long, DataFrame) => Unit): Unit = {
    val q = stream(spark, tableDir, startingVersion = 0,
        maxVersionsPerBatch = maxVersionsPerBatch, mode = mode,
        maxRowsPerBatch = maxRowsPerBatch)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(id, batch.toDF()); ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[drainAvailable]] collecting each batch's rows driver-side —
    * bounded test scaffolding only (a corpus-scale subscriber never
    * collects). Returns (batchId, rows) in batch order. */
  def drainCollect(spark: SparkSession, tableDir: String,
      checkpoint: String, maxVersionsPerBatch: Int = 0,
      mode: String = "appends",
      maxRowsPerBatch: Long = 0L): Seq[(Long, Seq[Row])] = {
    val got = ArrayBuffer.empty[(Long, Seq[Row])]
    drainAvailable(spark, tableDir, checkpoint, maxVersionsPerBatch,
        mode, maxRowsPerBatch) {
      (id, df) => got.synchronized { got += ((id, df.collect().toSeq)) }
    }
    got.sortBy(_._1).toSeq
  }
}
