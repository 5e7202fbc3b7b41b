package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side snapshot/commit protocol — the transactional layer over
  * the q196/q211/q226 maintenance verbs (compaction, Z-order rewrite,
  * manifest-pinned as-of reads). q226 proved time-travel READS over
  * hand-built file lists; this object makes the file lists the output
  * of committed OPERATIONS, the Iceberg/Delta snapshot model reduced
  * to its two load-bearing guarantees:
  *
  *   1. **Data files are immutable.** Every writer lands its files
  *      under a run-unique `data/<token>/` directory; nothing ever
  *      rewrites a published file, so any committed snapshot stays
  *      readable forever (time travel is file-list selection).
  *   2. **Commit = one atomic metadata operation.** A snapshot is a
  *      manifest file `manifests/v<N>.manifest` (one data-file path
  *      per line). Publishing version N is a hard-link creation of
  *      that name from a fully-written temp file — link creation is
  *      atomic in POSIX and FAILS if the name exists, which makes the
  *      version number a compare-and-swap slot: of two concurrent
  *      writers targeting v<N>, exactly one wins; the loser's data
  *      files are intact and its commit REBASES onto the winner's
  *      manifest and retries at v<N+1>. Readers only ever see fully
  *      committed manifests (the temp file is complete before the
  *      link exists).
  *
  * Append is manifest-union (old files + new files — no data read at
  * all). Replace is copy-on-write at FILE granularity: one job finds
  * which files contain matching rows (`_metadata.file_path` over the
  * snapshot scan — no per-file driver loop), one job rewrites exactly
  * those files with the update applied; untouched files are REUSED
  * byte-for-byte in the new manifest. At 100 TB an update touching one
  * partition rewrites that partition's files and relinks the rest —
  * cost tracks the touched data, never the table.
  *
  * Cited shape: Iceberg's spec (version-numbered metadata + atomic
  * swap + immutable data files); no reference-repo analogue (the
  * reference's state layer is fixture database files).
  */
object SnapshotOps {

  /** Commit attempt outcome for one version slot. */
  final case class Committed(version: Int, reused: Int, written: Int,
      conflicts: Int)

  private def manifestDir(tableDir: String): Path =
    Paths.get(tableDir, "manifests")

  private def manifestPath(tableDir: String, v: Int): Path =
    manifestDir(tableDir).resolve(s"v$v.manifest")

  /** Highest committed version; 0 = the empty table (no manifest). */
  def currentVersion(tableDir: String): Int = {
    val d = manifestDir(tableDir).toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .flatMap(f => "^v(\\d+)\\.manifest$".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .maxOption.getOrElse(0)
  }

  /** Data-file list of a committed snapshot (empty for version 0). */
  def snapshotFiles(tableDir: String, version: Int): Seq[String] =
    if (version == 0) Seq.empty
    else new String(Files.readAllBytes(manifestPath(tableDir, version)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq

  /** Read a committed snapshot as of `version` (manifest-pinned file
    * list, the q226 read path). Version 0 / an empty manifest reads as
    * an empty frame of `schema`. */
  def readSnapshot(spark: SparkSession, tableDir: String, version: Int,
      schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val files = snapshotFiles(tableDir, version)
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Option(schema).getOrElse(org.apache.spark.sql.types.StructType(Nil)))
  }

  def readLatest(spark: SparkSession, tableDir: String): DataFrame =
    readSnapshot(spark, tableDir, currentVersion(tableDir))

  /** Atomically publish `files` as version `v` iff `v` is still free.
    * Returns true on win, false when another writer took the slot.
    * Publish is hard-link creation from a fully-written temp file, so
    * a reader can never observe a partial manifest and two writers can
    * never both own one version. */
  private[graft] def tryPublish(tableDir: String, v: Int,
      files: Seq[String]): Boolean = {
    Files.createDirectories(manifestDir(tableDir))
    val tmp = manifestDir(tableDir).resolve(
      s".v$v-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp,
      files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(manifestPath(tableDir, v), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** One writer's immutable data-file directory for this table. */
  private def newDataDir(tableDir: String): String =
    s"$tableDir/data/${java.util.UUID.randomUUID().toString.take(12)}"

  private def parquetFilesIn(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq

  /** Transactional append: write `df` once as immutable files, then
    * CAS-commit "current manifest + my files" — rebasing (re-reading
    * the new current manifest) and retrying on version conflicts. The
    * data write never repeats; only the manifest union does. */
  def commitAppend(spark: SparkSession, tableDir: String, df: DataFrame,
      maxRetries: Int = 20): Committed = {
    val dir = newDataDir(tableDir)
    df.write.parquet(dir)
    val mine = parquetFilesIn(dir)
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val base = currentVersion(tableDir)
      if (tryPublish(tableDir, base + 1, snapshotFiles(tableDir, base) ++ mine))
        return Committed(base + 1, 0, mine.size, conflicts)
      conflicts += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commitAppend lost $maxRetries version races on $tableDir")
  }

  /** Transactional copy-on-write update: rows of the current snapshot
    * matching `cond` are replaced by `update` applied to them; files
    * with NO matching row are reused byte-for-byte. An intervening
    * commit fails the CAS, and since the rewrite's inputs are stale at
    * that point the whole plan (find + rewrite) rebases and re-runs —
    * the strict serializable behaviour, not blind-retry. A lost
    * attempt's data files become unreferenced orphans: never visible
    * to any reader (no manifest names them), reclaimed by maintenance
    * GC in a real deployment. */
  def commitRewrite(spark: SparkSession, tableDir: String, cond: Column,
      update: DataFrame => DataFrame, maxRetries: Int = 5): Committed = {
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val base = currentVersion(tableDir)
      val files = snapshotFiles(tableDir, base)
      require(files.nonEmpty, s"commitRewrite on empty table $tableDir")
      // job 1: which files contain matching rows (file-granularity
      // pruning via the metadata column — one distributed pass, a
      // manifest-sized collect)
      def localPath(p: String): String =
        if (p.startsWith("file:"))
          Paths.get(java.net.URI.create(p)).toString
        else p
      val touched = spark.read.parquet(files: _*)
        .where(cond)
        .select(col("_metadata.file_path").as("f"))
        .distinct().collect().map(r => localPath(r.getString(0))).toSet
      val reused = files.filterNot(f => touched.contains(localPath(f)))
      val toRewrite = files.diff(reused)
      val written = if (toRewrite.isEmpty) Seq.empty[String] else {
        // job 2: rewrite ONLY the touched files; non-matching rows in
        // them ride through unchanged
        val dir = newDataDir(tableDir)
        val in = spark.read.parquet(toRewrite: _*)
        update(in.where(cond)).unionByName(in.where(!coalesce(cond,
          lit(false)))).write.parquet(dir)
        parquetFilesIn(dir)
      }
      if (tryPublish(tableDir, base + 1, reused ++ written))
        return Committed(base + 1, reused.size, written.size, conflicts)
      conflicts += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commitRewrite lost $maxRetries version races on $tableDir")
  }

  /** Committed compaction — q196's maintenance verb as a TRANSACTION:
    * the current snapshot's files rewrite into `nFiles` coalesced
    * files (coalesce, not repartition: compaction is IO-bound, no
    * exchange) and the new manifest CAS-commits as the next version.
    * Content is untouched (the q237 oracle pins it); prior snapshots
    * keep reading the OLD files, so time travel spans maintenance. */
  def commitCompact(spark: SparkSession, tableDir: String,
      nFiles: Int, maxRetries: Int = 5): Committed = {
    var conflicts = 0
    while (conflicts <= maxRetries) {
      val base = currentVersion(tableDir)
      val files = snapshotFiles(tableDir, base)
      require(files.nonEmpty, s"commitCompact on empty table $tableDir")
      val dir = newDataDir(tableDir)
      spark.read.parquet(files: _*).coalesce(nFiles).write.parquet(dir)
      val written = parquetFilesIn(dir)
      if (tryPublish(tableDir, base + 1, written))
        return Committed(base + 1, 0, written.size, conflicts)
      conflicts += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commitCompact lost $maxRetries version races on $tableDir")
  }

  /** Orphan GC: drop every manifest older than the last
    * `keepVersions`, then delete data files no RETAINED manifest
    * references (lost-race leftovers, files only dropped snapshots
    * used). Deletion order is the safe one — manifests first, so no
    * reader can open a snapshot whose files are about to go; a crash
    * between the two phases leaves only harmless extra data files.
    * Returns (manifests dropped, data files deleted). */
  def vacuum(tableDir: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, "must retain at least the current version")
    val cur = currentVersion(tableDir)
    val keepFrom = math.max(1, cur - keepVersions + 1)
    val retained = (keepFrom to cur)
      .flatMap(snapshotFiles(tableDir, _)).toSet
    val dropped = (1 until keepFrom)
      .count(v => Files.deleteIfExists(manifestPath(tableDir, v)))
    val dataRoot = new java.io.File(s"$tableDir/data")
    var deleted = 0
    Option(dataRoot.listFiles()).getOrElse(Array.empty).foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (!retained.contains(f.getPath) && f.isFile) {
          val isData = f.getName.endsWith(".parquet")
          if (f.delete() && isData) deleted += 1
        }
      }
      // a writer dir whose files are all gone is itself garbage
      if (Option(d.listFiles()).forall(_.isEmpty)) d.delete()
    }
    (dropped, deleted)
  }
}
