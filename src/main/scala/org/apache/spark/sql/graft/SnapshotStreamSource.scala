package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{
  Offset => V2Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.SnapshotOps

/** Structured-streaming SOURCE over a committed snapshot table — the
  * missing "subscribe" verb of the table-format axis (Delta's
  * streaming source / Iceberg's incremental-scan streaming, both of
  * which are implemented exactly this way: a v1 `Source` whose offsets
  * are table versions and whose `getBatch` is the incremental
  * manifest read).
  *
  * Offset space: the table's committed VERSION number. A batch over
  * offsets (a, b] is [[SnapshotOps.readAppendsSince]](a, b) — the
  * manifest-level unit cancellation reads exactly the appended files,
  * with `b`'s deletion vectors applied, and the plan runs distributed
  * (no driver materialization: the batch frame is the incremental
  * read's own executed plan re-tagged as streaming). Progress and
  * replay idempotence come from the engine's own offset log in the
  * checkpoint: a restarted query resumes from the last committed
  * version and a replayed epoch re-reads the identical immutable span
  * — same files, same DVs, byte-identical rows.
  *
  * Rewrite spans FAIL FAST, by design: a compaction / COW update /
  * MOR delete of base rows inside a span means added-files ≠
  * added-rows, and an append-shaped consumer would double-count or
  * miss retractions. readAppendsSince's three-clause gate throws with
  * the snapshotDiff pointer; the stream surfaces that as the batch
  * failure rather than emitting silently wrong rows (Delta's
  * ignoreChanges-less default, the conservative choice). The escape
  * hatch the error points at is `mode=diff` — the change-feed read,
  * where rewrite spans are legal because batches carry row-level
  * deltas, not appended files.
  *
  * Options:
  *  - `path` — the snapshot table directory (required);
  *  - `startingVersion` (default 0) — emit (startingVersion, …]; 0
  *    makes the table's full current content the first batch, the
  *    Delta "initial snapshot" semantics;
  *  - `maxVersionsPerBatch` (default 0 = unbounded) — admission
  *    control: cap how many committed versions one micro-batch drains,
  *    so a subscriber far behind catches up in bounded batches;
  *  - `maxRowsPerBatch` (default 0 = unbounded) — row-capped admission
  *    (Delta's maxBytesPerTrigger shape): the span stops before its
  *    cumulative added-side rows (manifest `_rows` metadata — data
  *    rows of new units + positions of new DVs, no file listed)
  *    exceed the cap; the first pending version is always admitted so
  *    one over-cap commit drains rather than starves. Composes with
  *    `maxVersionsPerBatch` (version cap applies first);
  *  - `mode` (default `appends`) — `diff` switches every micro-batch
  *    to [[SnapshotOps.snapshotDiff]](from, to): the CHANGE FEED read
  *    (Delta readChangeFeed), rows = the span's net row-level delta
  *    tagged with a `change_type` column (`insert`/`delete`). Rewrite
  *    spans are LEGAL here — a compaction span nets to zero rows, a
  *    COW update nets to delete+insert pairs, a MOR delete to delete
  *    rows — because the diff compares row content, not file lineage.
  *    Net-applying every drained batch in order reconstructs the
  *    table's visible content exactly.
  *
  * Lives in the bridge namespace because the v1 `Source` contract and
  * the streaming-tagged DataFrame constructor
  * (`internalCreateDataFrame(_, _, isStreaming = true)`) are
  * Spark-internal surface — the same access pattern Delta uses.
  * Public entry: `graft.streaming.SnapshotStream.readAppendsStream`.
  */
class SnapshotStreamSource(sqlContext: SQLContext, tableDir: String,
    override val schema: StructType, startingVersion: Long,
    maxVersionsPerBatch: Long, diffMode: Boolean = false,
    maxRowsPerBatch: Long = 0L) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Trigger.AvailableNow contract: versions committed after the
    * query starts are NOT drained this run — the cap is pinned once. */
  @volatile private var availableNowCap: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = SnapshotOps.currentVersion(tableDir).toLong

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def versionOf(o: V2Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong // SerializedOffset from the log
  }

  override def initialOffset(): V2Offset = LongOffset(startingVersion)

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val from =
      if (start == null) startingVersion else versionOf(start)
    val cap = math.min(
      SnapshotOps.currentVersion(tableDir).toLong, availableNowCap)
    var end =
      if (maxVersionsPerBatch > 0) math.min(cap, from + maxVersionsPerBatch)
      else cap
    // row-capped admission (the maxBytesPerTrigger shape): stop the
    // span before its cumulative added-side rows exceed the cap —
    // computed entirely from manifest `_rows` metadata, no data file
    // listed. The FIRST pending version is always admitted (progress
    // guarantee: a single over-cap commit must drain, not starve).
    if (maxRowsPerBatch > 0 && end > from) {
      var v = from + 1
      var rows = SnapshotOps.spanAddedRows(tableDir, from.toInt, v.toInt)
      while (v < end && {
        val next =
          SnapshotOps.spanAddedRows(tableDir, v.toInt, v.toInt + 1)
        if (rows + next <= maxRowsPerBatch) { rows += next; true }
        else false
      }) v += 1
      end = v
    }
    LongOffset(math.max(end, from))
  }

  /** Legacy poll path (pre-admission-control engines). */
  override def getOffset: Option[V1Offset] = {
    val cur = SnapshotOps.currentVersion(tableDir).toLong
    if (cur <= startingVersion) None else Some(LongOffset(cur))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(o => versionOf(o)).getOrElse(startingVersion)
    val to = versionOf(end)
    val batch =
      if (to <= from)
        SnapshotOps.readSnapshot(spark, tableDir, 0, schema)
      else if (diffMode)
        // change-feed batches carry the span END's commit wall-clock
        // (Delta CDF's _commit_timestamp): a multi-version batch is
        // the net delta "as of `to`", so `to`'s stamp is its time
        SnapshotOps.snapshotDiff(spark, tableDir, from.toInt, to.toInt)
          .withColumn("_commit_timestamp",
            org.apache.spark.sql.functions.lit(
              SnapshotOps.snapshotTimestamp(tableDir, to.toInt)
                .getOrElse(-1L)))
      else SnapshotOps.readAppendsSince(spark, tableDir, from.toInt, to.toInt)
    // schema-evolution guard: replaying history version-by-version on
    // an evolved table makes early batches read pre-evolution files,
    // where the pinned (current) schema's added columns don't exist
    // yet — surface them as typed nulls (Delta's initial-snapshot
    // semantics) instead of failing the select below on legal
    // append-only history
    val present = batch.columns.toSet
    val padded = schema.fields.foldLeft(batch) { (df, f) =>
      if (present.contains(f.name)) df
      else df.withColumn(f.name,
        org.apache.spark.sql.functions.lit(null).cast(f.dataType))
    }
    // pin column order to the source schema (the engine asserts the
    // batch plan's output matches), then re-tag the SAME lazy plan as
    // streaming — rows stay distributed; copy() guards against
    // InternalRow reuse across the RDD boundary
    val pinned = padded.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    spark.internalCreateDataFrame(
      pinned.queryExecution.toRdd.map(_.copy()), schema, isStreaming = true)
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"SnapshotStreamSource[$tableDir]"
}

/** `spark.readStream.format("graft-snapshot").option("path", dir)` —
  * registered via META-INF/services (DataSourceRegister). */
class SnapshotSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("tableDir"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-snapshot source needs a 'path' option (the snapshot " +
          "table directory)"))

  private def isDiff(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("mode", "appends").toLowerCase match {
      case "appends" => false
      case "diff" => true
      case other => throw new IllegalArgumentException(
        s"graft-snapshot source: unknown mode '$other' " +
          "(expected 'appends' or 'diff')")
    }

  /** Memoized per provider instance: Spark resolves the schema in
    * `sourceSchema` (analysis) and again in `createSource` without
    * passing the first result back, and a full resolution walks the
    * manifest chain + parquet footers — pay that once per query
    * start, and pin ONE schema for both calls even if a commit lands
    * between them. */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def tableSchema(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val dir = dirOf(parameters)
    val base = schemaMemo.computeIfAbsent(dir, { d =>
      val v = SnapshotOps.currentVersion(d)
      require(v > 0, s"graft-snapshot source: no committed snapshot at " +
        s"$d — commit version 1 first (the schema comes from the table)")
      SnapshotOps.readSnapshot(sqlContext.sparkSession, d, v).schema
    })
    // change-feed batches carry the diff's change_type tag plus the
    // span-end commit's wall-clock stamp (Delta CDF parity)
    if (isDiff(parameters))
      base.add("change_type", org.apache.spark.sql.types.StringType,
        nullable = true)
        .add("_commit_timestamp", org.apache.spark.sql.types.LongType,
          nullable = true)
    else base
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(tableSchema(sqlContext, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotStreamSource(sqlContext, dirOf(parameters),
      schema.getOrElse(tableSchema(sqlContext, parameters)),
      parameters.getOrElse("startingVersion", "0").toLong,
      parameters.getOrElse("maxVersionsPerBatch", "0").toLong,
      diffMode = isDiff(parameters),
      maxRowsPerBatch =
        parameters.getOrElse("maxRowsPerBatch", "0").toLong)
}
