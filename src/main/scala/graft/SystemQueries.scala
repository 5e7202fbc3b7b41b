package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{MediaOps, Summarize}
import graft.streaming.StreamingOps

/** Streaming, multimodal, profiling and I/O-roundtrip entries
  * (SURVEY.md §2.1 S3-S13, §2.7 D8/D9, plus the streaming north-star).
  *
  * COPY roundtrips use the original table as the oracle: write → read
  * back → compare against `SELECT *` proves writer/reader fidelity
  * end-to-end, the same effect-vs-result decoupling the reference's
  * validation_sql uses for its COPY entries (dev.json:327-375). */
object SystemQueries {
  import Queries._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Per-JVM-unique run token. Two concurrent processes at the same sf
    * dir (r8: the builder's final sweep and the driver's own Verify)
    * must never share a scratch dir — r8's q194/q196 driver reds were
    * exactly this race: both entries keyed their dirs on hash(sfDir)
    * alone, so one process's overwrite interleaved with the other's
    * read, drifting aggregate values without changing the output
    * shape. pid + JVM-start nanos make the token unique across live
    * processes and across a recycled pid. */
  private[graft] val runToken: String =
    java.lang.Long.toHexString(ProcessHandle.current().pid()) + "-" +
      java.lang.Long.toHexString(System.nanoTime() & 0xffffffffL)

  /** Run-scoped scratch dir under `root` for the given sf dir. The
    * DuckDB oracles of entries using this never read these dirs (they
    * re-derive from the base tables), so the path can be fully
    * run-unique — unlike annRecall's handoff root, which must stay
    * FIXED for the cross-process oracle glob and uses atomic renames
    * instead. An age-gated prune of sibling run dirs bounds disk
    * growth; 6 h sits well past any observed whole-run duration, so a
    * concurrent live run's dir is never a casualty. */
  private[graft] def runScopedDir(root: String, sfDir: String): String = {
    val tag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL)
    val mine = s"$tag-$runToken"
    val cutoff = System.currentTimeMillis() - 6L * 60 * 60 * 1000
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName != mine && f.lastModified < cutoff)
      .foreach(deleteRecursively)
    s"$root/$mine"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Rolling content fingerprint shared by the snapshot/maintenance
    * entries: order-independent bit_xor of a 48-bit md5 slice of the
    * '|'-joined key columns. ONE definition so the entry family cannot
    * silently diverge; every oracle re-derives the same expression in
    * DuckDB syntax. */
  private def contentXor(cols: String*) =
    expr("bit_xor(cast(conv(substring(md5(concat(" +
      cols.map(c => s"cast($c as string)").mkString(", '|', ") +
      ")), 1, 12), 16, 10) as bigint))")

  /** Rebuilds the two bucketed tables (bucketBy(8, key) + sortBy) from
    * the currently registered sources and memoizes which sf dir they
    * were built from. Serialized: Verify/Bench may evaluate entries on
    * one session concurrently, and two interleaved rebuilds of a
    * managed table corrupt both. */
  private[graft] def rebuildBucketedLayout(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    bucketLock.synchronized {
      graft.operators.JoinOps.resetManagedTable(spark, "graft_li_bucketed")
      graft.operators.JoinOps.resetManagedTable(spark, "graft_ord_bucketed")
      spark.table("lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("graft_li_bucketed")
      spark.table("orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("graft_ord_bucketed")
      spark.conf.set("graft.bucketed.built", sfDir)
    }

  /** Builds the bucketed layout only if it isn't already present for
    * THIS sf dir (the warehouse steady state: layout written once,
    * joins reuse it). */
  private[graft] def ensureBucketedLayout(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    bucketLock.synchronized {
      val fresh = spark.conf.getOption("graft.bucketed.built")
        .contains(sfDir) &&
        spark.catalog.tableExists("graft_li_bucketed") &&
        spark.catalog.tableExists("graft_ord_bucketed")
      if (!fresh) rebuildBucketedLayout(spark, sfDir)
    }

  private val bucketLock = new Object

  val all: Seq[(String, Spec)] = Seq(

    // Structured Streaming windowed aggregation drained with AvailableNow;
    // oracle = the batch answer over the same files (stream==batch).
    "q51_stream_window_counts" -> api(
      (spark, sfDir) => StreamingOps.windowedEventCounts(spark, sfDir),
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      headline = true),

    // flatMapGroupsWithState sessionization (custom streaming state);
    // oracle = batch gaps-and-islands.
    "q52_stream_sessions" -> api(
      (spark, sfDir) => StreamingOps.sessionCounts(spark, sfDir, 30),
      """WITH m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |  count(*) AS total_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Streaming exactly-once dedup of an at-least-once (duplicated)
    // delivery; oracle = batch DISTINCT over the same files. The stream
    // dedups on the FULL row (matching DISTINCT), not just event_id —
    // an id collision carrying different attributes must not collapse.
    "q68_stream_dedup" -> api(
      (spark, sfDir) => StreamingOps.streamDedup(spark, sfDir),
      """SELECT DISTINCT event_id, user_id, event_type, ts
        |FROM events ORDER BY event_id""".stripMargin),

    // Streaming Bloom-prefiltered ingestion dedup — q188's continuous
    // form: the index sketch is computed offline, arriving docs pass a
    // STATELESS might-contain filter (definitely-new rows bypass any
    // join), only candidates take the stream-static confirm. Drained
    // with AvailableNow the output equals the batch anti-join, which is
    // exactly what the oracle computes — so the no-false-negative
    // property is gate-pinned in the streaming path too.
    "q191_stream_bloom_dedup" -> api(
      (spark, sfDir) => StreamingOps.streamBloomDedup(spark, sfDir),
      """WITH f AS (SELECT doc_id,
        |    md5(substring(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'), 1, 50)) AS fp
        |  FROM documents),
        |s AS (SELECT fp FROM f WHERE doc_id % 2 = 0),
        |i AS (SELECT fp, doc_id FROM f WHERE doc_id % 2 = 1)
        |SELECT doc_id, fp FROM i
        |WHERE fp NOT IN (SELECT fp FROM s)
        |ORDER BY doc_id""".stripMargin,
      headline = true),

    // Streaming MinHash near-dup pair detection (continuous-ingestion
    // dedup): per-bucket flatMapGroupsWithState over the banded
    // PORTABLE md5 MinHash signature, so the oracle reproduces the
    // entire pipeline — signatures, banding, candidate generation and
    // agreement verification — in plain SQL. q68 is the exact-dup
    // streaming operator; this is its near-dup sibling, completing the
    // batch q42 ↔ streaming axis.
    "q186_stream_neardup" -> api(
      (spark, sfDir) => StreamingOps.streamNearDupPairs(spark, sfDir)
        .select(col("id_a"), col("id_b"),
          col("n_agree").cast("long").as("n_agree"))
        .orderBy("id_a", "id_b"),
      """WITH w AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 2, 1) + 1),
        |    i -> array_to_string(w[i:i+2], ' ')))) AS s
        |  FROM w),
        |h AS (
        |  SELECT doc_id, j,
        |    min(('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || s),
        |      1, 12))::BIGINT) AS m
        |  FROM sh, range(16) r(j) GROUP BY doc_id, j),
        |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig
        |        FROM h GROUP BY doc_id),
        |band AS (
        |  SELECT doc_id, i, sig[2*i+1] AS h0, sig[2*i+2] AS h1
        |  FROM sig, range(8) r(i)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM band a JOIN band b
        |    ON a.i = b.i AND a.h0 = b.h0 AND a.h1 = b.h1
        |    AND a.doc_id < b.doc_id),
        |agr AS (
        |  SELECT c.id_a, c.id_b,
        |    (SELECT count(*) FROM range(16) r(j)
        |     WHERE sa.sig[j+1] = sb.sig[j+1]) AS n_agree
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b)
        |SELECT id_a, id_b, CAST(n_agree AS BIGINT) AS n_agree
        |FROM agr WHERE n_agree >= 8
        |ORDER BY id_a, id_b""".stripMargin, headline = true),

    // The same sessionization as pure batch SQL (gaps-and-islands) —
    // windows + lag on both engines.
    "q53_sessionize_batch" -> sql(
      """WITH m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, sum(new_s) AS n_sessions, count(*) AS total_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
      """WITH m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |  count(*) AS total_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
      headline = true),

    // Multimodal decode, REAL: PNG payloads (encoded by a different
    // stack — tools/gen_media_fixture.py, pure Python) decoded with the
    // JDK's javax.imageio codec into integer-exact pixel statistics.
    // Oracle = the independently precomputed per-image stats fixture,
    // scoped to the documents present in the bound sf. All-BIGINT
    // features ⇒ exact hash match, no float-parity caveats.
    "q54_media_features" -> api((spark, _) =>
      MediaOps.imageFeatures(MediaOps.imageTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // The batched (mapPartitions) decode path over the same image table —
    // the vectorized-codec call shape; same per-image ImageIO decode, so
    // bit-identical to q54's Column path (SystemOpsSpec) and checked
    // against the same stats oracle.
    "q100_media_batched" -> api((spark, _) =>
      MediaOps.imageFeaturesBatched(MediaOps.imageTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Multimodal RESIZE — the remaining verb of the
    // decode/feature/resize/frame-sample quartet: stride-2 top-left
    // nearest-neighbor downsample fused into the decode pass (resized
    // pixels never materialize), integer-exact stats of the RESIZED
    // image against an independently computed fixture
    // (tools/gen_media_fixture.py pix[::2, ::2] — a different stack
    // applying the same rule). Deterministic by construction: no
    // interpolation arithmetic to drift across platforms.
    "q189_media_resize" -> api((spark, _) =>
      MediaOps.imageResizeFeatures(MediaOps.imageTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/resize_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin,
      headline = true),

    // Multimodal FILE ingestion: the same PNG corpus read as individual
    // files through Spark's binaryFile source (path/content rows, file
    // split per task, pathGlobFilter pruning at listing) — the
    // filesystem/object-store ingestion path, with media_id recovered
    // from the file name and the decode verified against the same
    // independent stats fixture as q54. The file tree materializes once
    // per JVM (harness scaffolding; production files simply exist).
    "q192_media_binary_ingest" -> api((spark, _) =>
      MediaOps.imageFeatures(
        MediaOps.imageFilesTable(spark, "/tmp/graft_media_files")
          .join(broadcast(spark.table("documents").select(col("doc_id"))),
            col("media_id") === col("doc_id"), "leftsemi"))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Multimodal audio decode, REAL: RIFF/PCM16 WAV payloads (written
    // by Python's stdlib wave module — tools/gen_audio_fixture.py)
    // parsed with a pure byte-level chunk walk into integer-exact
    // sample statistics. Same fixture-oracle convention as q54.
    "q169_audio_features" -> api((spark, _) =>
      MediaOps.audioFeatures(MediaOps.audioTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/audio_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Multimodal audio RESAMPLE — decimate-by-2 fused into the decode
    // pass (every 2nd frame kept, rate halved by integer division; no
    // filter arithmetic to drift), stats of the DECIMATED stream
    // against a fixture applying the identical rule in numpy
    // (samples[::2]). q189's image-resize sibling.
    "q190_audio_resample" -> api((spark, _) =>
      MediaOps.audioResampleFeatures(MediaOps.audioTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/audio_resample_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin,
      headline = true),

    // The batched (mapPartitions) audio decode path — bit-identical to
    // q169's Column path (SystemOpsSpec), checked against the same
    // stats oracle.
    "q170_audio_batched" -> api((spark, _) =>
      MediaOps.audioFeaturesBatched(MediaOps.audioTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/audio_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Multimodal VIDEO decode, REAL: multi-frame GIF clips (encoded by
    // a pure-Python GIF89a writer — tools/gen_video_fixture.py) decoded
    // frame-by-frame with the JDK's javax.imageio GIF reader into
    // integer-exact pixel statistics pooled over all frames. Same
    // fixture-oracle convention as q54/q169; all-BIGINT ⇒ exact match.
    "q179_video_features" -> api((spark, _) =>
      MediaOps.videoFeatures(MediaOps.videoTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/video_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // The batched (mapPartitions) video decode path — bit-identical to
    // q179's Column path (SystemOpsSpec), checked against the same
    // stats oracle.
    "q180_video_batched" -> api((spark, _) =>
      MediaOps.videoFeaturesBatched(MediaOps.videoTable(spark))
        .orderBy("media_id"),
      """SELECT e.* FROM
        |  read_parquet('/root/repo/fixtures/media/video_expected.parquet') e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Video scene-change detection (r9): per-frame mean-luma shifts
    // over REAL JDK GIF frame decode, boundary when the shift clears
    // 16/pixel — integer arithmetic end to end (the comparison is
    // |Σluma_f − Σluma_{f−1}| >= 16·w·h, never a float mean). The
    // fixture's pixels follow the analytic law v = (x·7 + y·11 + k·13
    // + f·29) % 256 (tools/gen_video_fixture.py), so the oracle
    // re-derives EVERY per-frame luma sum in SQL from the generative
    // formula and runs the same boundary rule — decode, per-frame
    // accounting and detection are all cross-stack pinned without a
    // per-frame fixture column.
    "q229_video_scenes" -> api((spark, _) =>
      MediaOps.videoScenes(MediaOps.videoTable(spark))
        .orderBy("media_id"),
      """WITH m AS (SELECT g.media_id AS k,
        |    2 + g.media_id % 4 AS n, 12 + g.media_id % 5 AS w,
        |    12 + g.media_id % 3 AS h
        |  FROM read_parquet('/root/repo/fixtures/media/gifs.parquet') g
        |  JOIN documents d ON g.media_id = d.doc_id),
        |fr AS (SELECT k, n, w, h, f.f,
        |    (SELECT sum((x.x*7 + y.y*11 + k*13 + f.f*29) % 256)
        |     FROM unnest(range(0, w)) x(x), unnest(range(0, h)) y(y))
        |      AS sl
        |  FROM m, unnest(range(0, n)) f(f)),
        |d2 AS (SELECT k, n, w, h, f, sl,
        |    abs(sl - lag(sl) OVER (PARTITION BY k ORDER BY f)) AS dl
        |  FROM fr)
        |SELECT k AS media_id, CAST(max(n) AS BIGINT) AS n_frames,
        |  CAST(1 + sum(CASE WHEN dl >= 16*w*h THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_scenes,
        |  CAST(coalesce(sum(CASE WHEN dl >= 16*w*h
        |    THEN 1 << f ELSE 0 END), 0) AS BIGINT) AS boundaries_mask,
        |  CAST(sum(sl) AS BIGINT) AS total_luma
        |FROM d2 GROUP BY k, w, h ORDER BY media_id""".stripMargin),

    // End-to-end video featurization with the REAL per-frame kernel:
    // frames → per-frame luma-histogram features → mean-pooled
    // embedding — the extractFeatures pipeline with an actual codec in
    // the kernel seam. The pooled embedding is derivable from the
    // integer stats fixture (all frames of a clip share one size, so
    // mean-of-fractions = pooled-hist / (n_frames·w·h)), which makes
    // even the float embedding value-checked, not rows-only.
    //
    // The gate row projects the 8-dim embedding to scalar e0..e7 DOUBLE
    // columns: the driver's pandas canonicalizer cannot sort/hash an
    // array-valued cell (CORRECTNESS_r07 `err` on the array form), and
    // per-element scalars carry the identical information for a
    // fixed-width embedding. The array-form output is asserted in
    // SystemOpsSpec ("video embedding: real per-frame kernel ...").
    "q181_video_embedding" -> api((spark, _) =>
      MediaOps.extractFeaturesVideo(MediaOps.videoTable(spark))
        .select(Seq(col("media_id"),
            col("n_frames").cast("long").as("n_frames")) ++
          (0 until 8).map(i => graft.functions.GraftFunctions
            .duckRound(col("embedding")(i), 6).as(s"e$i")): _*)
        .orderBy("media_id"),
      """SELECT e.media_id, e.n_frames,
        |  round(h0 / px, 6) AS e0, round(h1 / px, 6) AS e1,
        |  round(h2 / px, 6) AS e2, round(h3 / px, 6) AS e3,
        |  round(h4 / px, 6) AS e4, round(h5 / px, 6) AS e5,
        |  round(h6 / px, 6) AS e6, round(h7 / px, 6) AS e7
        |FROM (
        |  SELECT media_id, n_frames,
        |    CAST(n_frames * width * height AS DOUBLE) AS px,
        |    h0, h1, h2, h3, h4, h5, h6, h7
        |  FROM read_parquet('/root/repo/fixtures/media/video_expected.parquet')) e
        |JOIN documents d ON e.media_id = d.doc_id
        |ORDER BY e.media_id""".stripMargin),

    // Skew-proof two-stage salted aggregation: rows spread over 8
    // sub-keys, partial per (key, salt), final per key. The oracle is
    // the PLAIN group-by — salting must be algebraically invisible.
    // (DECIMAL partials ⇒ exact merge at any parallelism.)
    "q101_salted_agg" -> api((spark, _) =>
      graft.operators.JoinOps.saltedAggregate(
          spark.table("lineitem"), "l_returnflag", saltFactor = 8,
          partial = Seq(
            sum(col("l_quantity").cast("decimal(18,2)")).as("ps"),
            count(lit(1)).as("pc")),
          finalAgg = Seq(
            round(sum(col("ps")).cast("double"), 2).as("qty"),
            sum(col("pc")).as("n")))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // Skew-proof salted join: the dim side replicated 8x so a hot fact
    // key fans out over 8 reducers; the oracle is the plain join+agg
    // (same values — the salting is pure execution strategy).
    "q102_salted_join" -> api((spark, _) =>
      graft.operators.JoinOps.saltedJoin(
          spark.table("orders"), spark.table("customer"),
          "o_custkey", "c_custkey", saltFactor = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // Bucketed co-located join: both sides written bucketBy(8, key) +
    // sortBy(key), so the sort-merge join consumes the bucket layout
    // directly — NO exchange below the join (plan-asserted in
    // SystemOpsSpec). This is the warehouse pattern that turns every
    // recurring fact⋈fact join at 100 TB from a full shuffle into a
    // map-side merge; the oracle is the plain join + agg (bucketing is
    // pure physical layout, algebraically invisible).
    // Split into layout cost (q182 — the one-time bucketBy write a
    // warehouse amortizes over every later join) and join cost (q177 —
    // the exchange-free merge itself, what recurs at 100 TB). q177
    // builds the layout only if q182 hasn't for this sf dir, so its
    // BENCH min (best of interleaved passes, layout present by pass 2)
    // times the join alone.
    "q177_bucketed_join" -> api((spark, sfDir) => {
      ensureBucketedLayout(spark, sfDir)
      spark.table("graft_li_bucketed").hint("merge")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("qty"))
        .orderBy("o_orderpriority")
    },
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      headline = true),

    // The layout-write half: always rebuilds both bucketed tables from
    // the registered sources (so its bench row IS the layout cost) and
    // reports what it wrote. Oracle = source row counts: a silent
    // partial write fails the count compare.
    "q182_bucket_layout" -> api((spark, sfDir) => {
      rebuildBucketedLayout(spark, sfDir)
      spark.table("graft_li_bucketed")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit("graft_li_bucketed").as("table_name"), col("n_rows"))
        .union(spark.table("graft_ord_bucketed")
          .agg(count(lit(1)).as("n_rows"))
          .select(lit("graft_ord_bucketed").as("table_name"), col("n_rows")))
        .orderBy("table_name")
    },
      """SELECT 'graft_li_bucketed' AS table_name, count(*) AS n_rows
        |FROM lineitem
        |UNION ALL
        |SELECT 'graft_ord_bucketed', count(*) FROM orders
        |ORDER BY table_name""".stripMargin, headline = true),

    // DESCRIBE with DuckDB type names from the Spark schema.
    "q55_describe" -> api((spark, _) =>
      Summarize.describe(spark.table("lineitem"))
        .select(col("column_name"), col("column_type"))
        .orderBy("column_name"),
      """SELECT column_name, column_type FROM (DESCRIBE lineitem)
        |ORDER BY column_name""".stripMargin),

    // SUMMARIZE: the EXACT columns of the 12-stat single-pass profile
    // (name, type, min, max, count, null%) value-checked against
    // DuckDB's own SUMMARIZE output row-by-row; the approximate columns
    // (approx_unique, quantile sketches) differ across engines by
    // design and stay pinned in SummarizeSpec instead. null_percentage
    // is normalized through VARCHAR on the oracle side because its
    // rendering changed across DuckDB versions ('0.0%' → DECIMAL).
    "q56_summarize" -> api((spark, _) =>
      Summarize.summarize(spark.table("customer"))
        .select(col("column_name"), col("column_type"), col("min"),
          col("max"), col("count"), col("null_percentage"))
        .orderBy("column_name"),
      """SELECT column_name, column_type, min, max, count,
        |  CAST(REPLACE(CAST(null_percentage AS VARCHAR), '%', '')
        |    AS DOUBLE) AS null_percentage
        |FROM (SUMMARIZE customer) ORDER BY column_name""".stripMargin),

    // Exact profile variant: count/nulls/distinct/min/max/avg for the
    // lineitem measures in ONE scan (all stats are slots of a single agg
    // row, unpivoted with stack) — the value-checked counterpart of
    // q56's sketch-based SUMMARIZE. The oracle spells the same stats as
    // per-column UNION ALL aggregates.
    "q114_exact_stats" -> api((spark, _) =>
      Summarize.exactStats(spark.table("lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("column_name"),
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        s"""SELECT '$c' AS column_name, count($c) AS n,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
           |  CAST(CAST(sum(CAST($c AS DECIMAL(18,6))) AS DOUBLE)
           |    / count($c) AS DOUBLE) AS avg
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),

    // Schema-evolution ingestion: two parquet generations of the same
    // table — an old writer without l_returnflag and a new writer with
    // it — read as ONE table via mergeSchema=true (the union-by-name
    // read every long-lived 100 TB dataset eventually needs; listing
    // merges footers, old files yield nulls for the added column). The
    // Spark side REALLY writes both generations and re-reads them
    // merged; the oracle re-derives the same aggregate from lineitem
    // directly, so what's pinned is the merge SEMANTICS (null backfill,
    // column alignment), not tmp-file plumbing.
    "q194_merge_schema_read" -> api((spark, sfDir) => {
      val dir = runScopedDir("/tmp/graft_q194", sfDir)
      val li = spark.table("lineitem")
      li.where(pmod(col("l_orderkey"), lit(2)) === 0)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/gen_old")
      li.where(pmod(col("l_orderkey"), lit(2)) === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_returnflag"))
        .write.mode("overwrite").parquet(s"$dir/gen_new")
      spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen_old", s"$dir/gen_new")
        .groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"))
        .orderBy(col("rf").asc_nulls_first)
        // Materialize the 4-row aggregate NOW (eager localCheckpoint)
        // so the returned frame never lazily re-reads the scratch dir:
        // run-unique dirs (r8) cover two processes, but a harness that
        // invokes this fn twice in ONE JVM (retry, or parallel
        // rows/schema/hash actions) shares runToken, and invocation
        // B's overwrite would interleave with A's deferred read.
        .localCheckpoint()
    },
      """SELECT CASE WHEN l_orderkey % 2 = 0 THEN NULL
        |  ELSE l_returnflag END AS rf,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY rf NULLS FIRST""".stripMargin),

    // Small-files COMPACTION — the operational sibling of q182's
    // bucketed layout: streaming/micro-batch ingest leaves a table as
    // hundreds of tiny files (here: a bounded lineitem slice
    // deliberately fragmented into 64 parts), and the daily maintenance
    // job rewrites it coalesced. coalesce() merges partitions WITHOUT a
    // shuffle — each output task chains input splits — which is the
    // point: compaction is IO-bound, a repartition() would pay an
    // exchange for nothing. The oracle pins data equality through the
    // fragment→compact→read cycle (row count + quantity sum + an
    // order-independent bit_xor content checksum over the PK); the
    // file-count collapse itself (64 → 2) is asserted in SystemOpsSpec,
    // where the filesystem is visible.
    "q196_compaction" -> api((spark, sfDir) => {
      val dir = runScopedDir("/tmp/graft_q196", sfDir)
      spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/fragmented")
      spark.read.parquet(s"$dir/fragmented")
        .coalesce(2)
        .write.mode("overwrite").parquet(s"$dir/compacted")
      spark.read.parquet(s"$dir/compacted")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"),
          contentXor("l_orderkey", "l_linenumber", "l_quantity")
            .as("content_xor"))
        // Eager 1-row materialization: sever the action-time read of
        // the shared-within-JVM scratch dir (see q194).
        .localCheckpoint()
    },
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM lineitem WHERE l_orderkey <= 2000""".stripMargin),

    // Manifest-pinned TIME-TRAVEL reads (r9): snapshot 1 writes three
    // immutable partition files; snapshot 2 is a copy-on-write update
    // of ONE partition (qty+1 on returnflag A) — a new file, the other
    // two files REUSED byte-for-byte, exactly the Iceberg/Delta
    // snapshot model. Reading "as of" a snapshot = selecting that
    // manifest's file list; no data is rewritten or duplicated for the
    // untouched partitions. Both snapshots' content is pinned by the
    // q196 rolling-xor fingerprint, which the oracle re-derives from
    // lineitem (v1 verbatim, v2 via the same +1 rule) — a wrong file
    // list, a missed update, or a stale reuse all move the xor.
    "q226_time_travel" -> api((spark, sfDir) => {
      val dir = runScopedDir("/tmp/graft_q226", sfDir)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      Seq("A", "N", "R").foreach { f =>
        base.where(col("l_returnflag") === f)
          .write.mode("overwrite").parquet(s"$dir/part_${f}_v1")
      }
      base.where(col("l_returnflag") === "A")
        .withColumn("l_quantity", col("l_quantity") + 1)
        .write.mode("overwrite").parquet(s"$dir/part_A_v2")
      val manifest = Seq(
        1 -> Seq("part_A_v1", "part_N_v1", "part_R_v1"),
        2 -> Seq("part_A_v2", "part_N_v1", "part_R_v1"))
      manifest.map { case (sid, files) =>
        spark.read.parquet(files.map(f => s"$dir/$f"): _*)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(sid).cast("int").as("snapshot"), col("n"),
            col("qty"), col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("snapshot")
        // Eager 2-row materialization: sever the action-time read of
        // the shared-within-JVM scratch dir (see q194).
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM lineitem WHERE l_orderkey <= 2000),
        |v1 AS (SELECT 1 AS snapshot, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    bit_xor(('0x' || substring(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT)
        |      AS content_xor
        |  FROM b),
        |v2src AS (SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'A' THEN l_quantity + 1
        |      ELSE l_quantity END AS l_quantity
        |  FROM b),
        |v2 AS (SELECT 2 AS snapshot, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    bit_xor(('0x' || substring(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT)
        |      AS content_xor
        |  FROM v2src)
        |SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |ORDER BY snapshot""".stripMargin,
      headline = true),

    // Snapshot COMMIT protocol (r10) — q226's write side: the three
    // snapshots here are produced by committed OPERATIONS (append,
    // append, copy-on-write update), not hand-built file lists. Each
    // commit atomically publishes manifests/v<N>.manifest (hard-link
    // CAS on the version slot — two writers can't both own a version);
    // data files are immutable, so v1/v2 remain readable verbatim
    // after v3, and the COW update rewrites only files containing
    // returnflag-A rows (appends partition by returnflag, so the N/R
    // files are REUSED byte-for-byte — asserted in SnapshotOpsSpec
    // where the manifests are visible). The oracle re-derives every
    // snapshot's count/sum/xor fingerprint from lineitem.
    "q234_snapshot_commits" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q234", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 1000)
          .repartitionByRange(3, col("l_returnflag")))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 1000)
          .repartitionByRange(3, col("l_returnflag")))
      SnapshotOps.commitRewrite(spark, table,
        col("l_returnflag") === "A",
        _.withColumn("l_quantity", col("l_quantity") + 1))
      (1 to 3).map { v =>
        SnapshotOps.readSnapshot(spark, table, v)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(v).cast("int").as("version"), col("n"), col("qty"),
            col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("version")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM lineitem WHERE l_orderkey <= 2000),
        |fp AS (SELECT 1 AS version, l_orderkey, l_linenumber, l_quantity
        |    FROM b WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, l_quantity FROM b
        |  UNION ALL
        |  SELECT 3, l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'A' THEN l_quantity + 1
        |      ELSE l_quantity END
        |  FROM b)
        |SELECT version, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM fp GROUP BY version ORDER BY version""".stripMargin,
      headline = true),

    // Maintenance UNDER the commit protocol (r10): the full operational
    // lifecycle as one version chain — fragmented appends (v1, v2),
    // compaction as a committed rewrite (v3: same rows, coalesced
    // files — the oracle pins v3 ≡ v2 content), then a COW update over
    // the compacted layout (v4). Time travel spans maintenance: v1/v2
    // still read their original fragmented files after v3 replaced
    // them in the live manifest. File-count collapse and vacuum GC
    // (drop v1, delete newly-orphaned fragments, retained snapshots
    // unaffected) are asserted in SnapshotOpsSpec where the
    // filesystem is visible.
    "q237_committed_maintenance" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q237", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 1000).repartition(16))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 1000).repartition(16))
      SnapshotOps.commitCompact(spark, table, nFiles = 2)
      SnapshotOps.commitRewrite(spark, table,
        col("l_returnflag") === "A",
        _.withColumn("l_quantity", col("l_quantity") + 1))
      (1 to 4).map { v =>
        SnapshotOps.readSnapshot(spark, table, v)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(v).cast("int").as("version"), col("n"), col("qty"),
            col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("version")
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM lineitem WHERE l_orderkey <= 2000),
        |fp AS (SELECT 1 AS version, l_orderkey, l_linenumber, l_quantity
        |    FROM b WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, l_quantity FROM b
        |  UNION ALL
        |  SELECT 3, l_orderkey, l_linenumber, l_quantity FROM b
        |  UNION ALL
        |  SELECT 4, l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'A' THEN l_quantity + 1
        |      ELSE l_quantity END
        |  FROM b)
        |SELECT version, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM fp GROUP BY version ORDER BY version""".stripMargin,
      headline = true),

    // Manifest-level DATA SKIPPING (r10): appends record per-file
    // numeric min/max bounds in the manifest (statsCols — one pass
    // over only the new files), and a range read prunes the file list
    // BEFORE Spark lists or opens anything: range-partitioned appends
    // give narrow per-file key bands, so a key-range query opens the
    // handful of covering files, not the table — the Iceberg/Delta
    // skip model ahead of parquet row-group pruning. The `pruned`
    // column is computed from the actual manifest consultation (kept <
    // total files); the oracle pins every range's content and that
    // pruning really happened. Cross-append skipping is bounds-exact
    // (disjoint key spans), not sampling-dependent.
    "q238_stats_pruned_read" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q238", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 4000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 2000)
          .repartitionByRange(8, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 2000)
          .repartitionByRange(8, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      val v = SnapshotOps.currentVersion(table)
      val total = SnapshotOps.snapshotEntries(table, v).size
      // metadata-only count(*): summed from the manifest's per-file
      // row stats, no data file opened (oracle pins it to the scan)
      val metaRows = SnapshotOps.snapshotRowCount(table, v).get
      Seq((1, 400), (1801, 2200), (3601, 4000)).map { case (lo, hi) =>
        val kept = SnapshotOps.rangeFiles(table, v, "l_orderkey",
          BigDecimal(lo), BigDecimal(hi)).size
        SnapshotOps.readSnapshotRange(spark, table, v, "l_orderkey",
          BigDecimal(lo), BigDecimal(hi))
          .agg(count(col("l_orderkey")).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"))
          .select(lit(lo).cast("int").as("lo"), lit(hi).cast("int").as("hi"),
            col("n"), col("qty"), lit(kept < total).as("pruned"),
            lit(metaRows).cast("bigint").as("meta_rows"))
      }.reduce(_.unionByName(_)).orderBy("lo")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_quantity FROM lineitem
        |    WHERE l_orderkey <= 4000),
        |r(lo, hi) AS (VALUES (1, 400), (1801, 2200), (3601, 4000))
        |SELECT lo, hi, count(l_orderkey) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS meta_rows
        |FROM r LEFT JOIN b ON l_orderkey BETWEEN lo AND hi
        |GROUP BY lo, hi ORDER BY lo""".stripMargin,
      headline = true),

    // Snapshot DIFF / CDC read (r10): the multiset row-level delta
    // between two committed versions, reading ONLY the symmetric
    // difference of the manifests' file sets — files reused across
    // versions (append + file-granular COW leave most untouched)
    // contribute identical multisets to both sides and are never
    // scanned, so diff cost tracks the changed data, not the table.
    // Inserts are rows v3 has more copies of than v1, deletes the
    // reverse; the COW update surfaces as delete+insert. The oracle
    // re-derives the same delta with EXCEPT ALL both ways.
    "q239_snapshot_diff" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q239", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 1000)
          .repartitionByRange(3, col("l_returnflag")))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 1000)
          .repartitionByRange(3, col("l_returnflag")))
      SnapshotOps.commitRewrite(spark, table,
        col("l_returnflag") === "A",
        _.withColumn("l_quantity", col("l_quantity") + 1))
      SnapshotOps.snapshotDiff(spark, table, 1, 3)
        .orderBy("change_type", "l_orderkey", "l_linenumber")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM lineitem WHERE l_orderkey <= 2000),
        |v1 AS (SELECT * FROM b WHERE l_orderkey <= 1000),
        |v3 AS (SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'A' THEN l_quantity + 1
        |      ELSE l_quantity END AS l_quantity, l_returnflag FROM b),
        |ins AS (SELECT * FROM v3 EXCEPT ALL SELECT * FROM v1),
        |del AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v3)
        |SELECT *, 'insert' AS change_type FROM ins
        |UNION ALL
        |SELECT *, 'delete' AS change_type FROM del
        |ORDER BY change_type, l_orderkey, l_linenumber""".stripMargin,
      headline = true),

    // Exactly-once STREAMING ingestion into the snapshot table (r10):
    // a file stream consumed one chunk per micro-batch, each batch
    // CAS-committed as one snapshot version carrying a txn watermark
    // (#txn.<stream>:<batchId>) — so the version history IS the batch
    // history (3 chunks → 3 versions, pinned), a replayed epoch (the
    // foreachBatch at-least-once case, simulated post-drain) skips
    // without writing a byte (`replay_skipped` pinned TRUE), and the
    // committed table is immediately range-prunable via the per-batch
    // doc_id bounds (`n_range` read through manifest skipping).
    "q240_stream_snapshot_sink" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val scratch = s"${runScopedDir("/tmp/graft_q240", sfDir)}/s-" +
        java.util.UUID.randomUUID().toString.take(8)
      val (table, versions, replaySkipped) =
        StreamingOps.streamSnapshotSink(spark, sfDir, scratch, chunks = 3)
      val nRange = SnapshotOps.readSnapshotRange(spark, table, versions,
        "doc_id", BigDecimal(10), BigDecimal(59)).count()
      SnapshotOps.readLatest(spark, table)
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"),
          count_distinct(col("lang")).as("langs"))
        .select(lit(versions).cast("int").as("versions"), col("n"),
          col("total_chars"), col("langs"),
          lit(nRange).cast("bigint").as("n_range"),
          lit(replaySkipped).as("replay_skipped"))
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """SELECT 3 AS versions, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |  CAST(count(CASE WHEN doc_id BETWEEN 10 AND 59 THEN 1 END)
        |    AS BIGINT) AS n_range,
        |  TRUE AS replay_skipped
        |FROM documents""".stripMargin,
      headline = true),

    // Schema EVOLUTION under the commit protocol (r10): v1 appends the
    // 3-column shape, v2 appends an EVOLVED 4-column batch (pure
    // append — the old files are untouched, the new column exists only
    // in the new files), the merged read surfaces pre-evolution rows
    // with the new column null (reader-side defaults, zero rewrite —
    // the q194 read generalized to the versioned table), and v3
    // BACKFILLS via the file-granular COW (only the null-bearing v1
    // files rewrite, schema-anchored so they pick up the column). The
    // oracle pins every version's row count, null/backfill accounting,
    // and a content fingerprint over the ORIGINAL columns proving
    // evolution and backfill never disturbed existing data.
    "q245_schema_evolution_commits" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q245", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 1000)
          .drop("l_returnflag").repartition(4))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 1000).repartition(4))
      SnapshotOps.commitRewrite(spark, table,
        col("l_returnflag").isNull,
        _.withColumn("l_returnflag", lit("?")),
        mergeSchema = true)
      (1 to 3).map { v =>
        val snap = SnapshotOps.readSnapshot(spark, table, v,
          mergeSchema = true)
        val withFlag = if (snap.columns.contains("l_returnflag")) snap
          else snap.withColumn("l_returnflag", lit(null).cast("string"))
        withFlag.agg(count(lit(1)).as("n"),
          count(when(col("l_returnflag").isNull, 1)).as("flag_nulls"),
          count(when(col("l_returnflag") === "?", 1)).as("backfilled"),
          contentXor("l_orderkey", "l_linenumber", "l_quantity")
            .as("content_xor"))
          .select(lit(v).cast("int").as("version"), col("n"),
            col("flag_nulls"), col("backfilled"), col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("version")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity
        |    FROM lineitem WHERE l_orderkey <= 2000),
        |lo AS (SELECT * FROM b WHERE l_orderkey <= 1000),
        |fp AS (SELECT 1 AS version, l_orderkey, l_linenumber,
        |    l_quantity, 1 AS has_null, 0 AS backfilled_row
        |  FROM lo
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, l_quantity,
        |    CASE WHEN l_orderkey <= 1000 THEN 1 ELSE 0 END, 0 FROM b
        |  UNION ALL
        |  SELECT 3, l_orderkey, l_linenumber, l_quantity, 0,
        |    CASE WHEN l_orderkey <= 1000 THEN 1 ELSE 0 END FROM b)
        |SELECT version, count(*) AS n,
        |  CAST(sum(has_null) AS BIGINT) AS flag_nulls,
        |  CAST(sum(backfilled_row) AS BIGINT) AS backfilled,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM fp GROUP BY version ORDER BY version""".stripMargin,
      headline = true),

    // Per-file BLOOM point index (r10): the equality complement of
    // q238's min/max skipping — bounds need a sort order, blooms skip
    // point probes on high-cardinality STRING keys in any layout.
    // Appends record one small Bloom filter per file per bloomCol in
    // the manifest (one pass over only the new files); a point read
    // probes the manifest's blooms driver-side (pure metadata, the
    // probe hash is the same Catalyst XxHash64 the build inserted) and
    // opens only might-contain files. Probes are the clerks of the 3
    // smallest custkeys (deterministic, re-derivable by the oracle);
    // `pruned` is computed from the actual manifest consultation. A
    // false positive costs one extra file scan, never a missed row —
    // the oracle pins exactly that.
    "q248_bloom_point_index" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q248", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      SnapshotOps.commitAppend(spark, table,
        base.where(pmod(col("c_custkey"), lit(2)) === 0)
          .repartition(8, col("c_name")), bloomCols = Seq("c_name"))
      SnapshotOps.commitAppend(spark, table,
        base.where(pmod(col("c_custkey"), lit(2)) === 1)
          .repartition(8, col("c_name")), bloomCols = Seq("c_name"))
      val v = SnapshotOps.currentVersion(table)
      val total = SnapshotOps.snapshotEntries(table, v).size
      val probes = base.orderBy("c_custkey").limit(3)
        .select("c_name").collect().map(_.getString(0)).distinct.sorted
      probes.map { name =>
        val kept = SnapshotOps.pointFiles(spark, table, v, "c_name", name).size
        SnapshotOps.readSnapshotPoint(spark, table, v, "c_name", name)
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("double").as("acctbal"))
          .select(lit(name).as("name"), col("n"), col("acctbal"),
            lit(kept < total).as("pruned"))
      }.reduce(_.unionByName(_)).orderBy("name")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH p AS (SELECT DISTINCT c_name FROM (
        |    SELECT c_name FROM customer ORDER BY c_custkey LIMIT 3))
        |SELECT p.c_name AS name, count(c.c_custkey) AS n,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
        |    AS DOUBLE) AS acctbal,
        |  TRUE AS pruned
        |FROM p LEFT JOIN customer c ON c.c_name = p.c_name
        |GROUP BY p.c_name ORDER BY name""".stripMargin,
      headline = true),

    // Small-file compaction POLICY (r10): the maintenance verb a
    // warehouse schedules nightly — q196/q237's whole-table compaction
    // generalized to bin-packing: files under target/2 first-fit-
    // decreasing pack into ~target-sized bins (driver stat of the
    // manifest's files — a metadata operation), each bin rewrites into
    // one file, at-size files are REUSED byte-for-byte with their
    // stats lines intact. Maintenance cost tracks the small-file mass,
    // never the table. The target derives from the big file's actual
    // size so the classification is sf-independent; the oracle pins
    // every version's content (v3 ≡ v2 through the policy pass);
    // reuse/bin structure is asserted in SnapshotOpsSpec where the
    // filesystem is visible.
    "q249_compaction_policy" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q249", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem")
        .where(pmod(col("l_orderkey"), lit(5)) === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      SnapshotOps.commitAppend(spark, table,
        base.where(pmod(col("l_orderkey"), lit(25)) < 20).repartition(4))
      SnapshotOps.commitAppend(spark, table,
        base.where(pmod(col("l_orderkey"), lit(25)) === 20).repartition(12))
      // target = 1.5x the largest at-size file, so the small/large
      // classification (< target/2 = 0.75x big) holds at every sf even
      // when parquet footer overhead dominates tiny test files
      val target = SnapshotOps.snapshotFiles(table, 1)
        .map(f => new java.io.File(f).length()).max * 3 / 2
      SnapshotOps.commitCompactSmall(spark, table, target)
      (1 to 3).map { v =>
        SnapshotOps.readSnapshot(spark, table, v)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(v).cast("int").as("version"), col("n"), col("qty"),
            col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("version")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity
        |    FROM lineitem WHERE l_orderkey % 5 = 0),
        |fp AS (SELECT 1 AS version, l_orderkey, l_linenumber, l_quantity
        |    FROM b WHERE l_orderkey % 25 < 20
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, l_quantity FROM b
        |  UNION ALL
        |  SELECT 3, l_orderkey, l_linenumber, l_quantity FROM b)
        |SELECT version, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM fp GROUP BY version ORDER BY version""".stripMargin,
      headline = true),

    // MERGE under the commit protocol (r10): q87's upsert semantics as
    // a TRANSACTION on the versioned table — source rows sharing a
    // (l_orderkey, l_linenumber) key replace their target rows, the
    // rest append; copy-on-write finds the matched files with one
    // broadcast semi-join and rewrites ONLY those (the v1 appends are
    // range-partitioned on the key, so low-key files carry forward
    // byte-for-byte — asserted in SnapshotOpsSpec), and v1 stays
    // readable verbatim. The oracle re-derives both versions' count/
    // sum/xor fingerprints from lineitem.
    "q251_snapshot_merge" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q251", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      SnapshotOps.commitAppend(spark, table,
        li.where(col("l_orderkey") <= 1000)
          .repartitionByRange(4, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      // the synthetic lineitem repeats (orderkey, linenumber) keys, so
      // the source dedups to max-quantity per key — commitMerge itself
      // REFUSES a key-duplicated source (order-dependent otherwise);
      // matched target dup-copies all collapse to the one source row
      SnapshotOps.commitMerge(spark, table,
        li.where(col("l_orderkey") > 800 && col("l_orderkey") <= 1200)
          .groupBy("l_orderkey", "l_linenumber")
          .agg((max(col("l_quantity")) + 100).as("l_quantity")),
        Seq("l_orderkey", "l_linenumber"))
      (1 to 2).map { v =>
        SnapshotOps.readSnapshot(spark, table, v)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(v).cast("int").as("version"), col("n"), col("qty"),
            col("content_xor"))
      }.reduce(_.unionByName(_)).orderBy("version")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity
        |    FROM lineitem),
        |fp AS (SELECT 1 AS version, l_orderkey, l_linenumber, l_quantity
        |    FROM li WHERE l_orderkey <= 1000
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, l_quantity FROM li
        |    WHERE l_orderkey <= 800
        |  UNION ALL
        |  SELECT 2, l_orderkey, l_linenumber, max(l_quantity) + 100
        |    FROM li WHERE l_orderkey > 800 AND l_orderkey <= 1200
        |    GROUP BY l_orderkey, l_linenumber)
        |SELECT version, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM fp GROUP BY version ORDER BY version""".stripMargin,
      headline = true),

    // OPTIMIZE ZORDER as a COMMIT (r10): q211's layout job unified
    // with the table format — the snapshot rewrites sorted by the
    // Morton interleave of (l_orderkey, l_partkey) and the manifest
    // records per-file min/max on BOTH dimensions, so a two-sided box
    // predicate prunes from metadata alone (q238 generalized to 2-D).
    // The pre-cluster hash layout keeps every file's box wide —
    // `pruned` certifies the clustered version consults strictly fewer
    // files than the hash version for the same box; the oracle pins
    // every box's content and the total (layout change moved no rows).
    "q252_zorder_commit" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q252", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      SnapshotOps.commitAppend(spark, table,
        spark.table("lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            col("l_extendedprice")).repartition(8),
        statsCols = Seq("l_orderkey", "l_partkey"))
      SnapshotOps.commitCluster(spark, table, "l_orderkey", "l_partkey",
        nFiles = 8)
      val boxes = Seq((100, 300, 0, 99), (500, 900, 100, 199))
      boxes.map { case (oLo, oHi, pLo, pHi) =>
        val box = Seq(
          ("l_orderkey", BigDecimal(oLo), BigDecimal(oHi)),
          ("l_partkey", BigDecimal(pLo), BigDecimal(pHi)))
        val hashKept = SnapshotOps.boxFiles(table, 1, box).size
        val zKept = SnapshotOps.boxFiles(table, 2, box).size
        SnapshotOps.readSnapshotBox(spark, table, 2, box)
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("price"))
          .select(lit(oLo).cast("int").as("o_lo"),
            lit(pLo).cast("int").as("p_lo"), col("n"), col("price"),
            lit(zKept < hashKept).as("pruned"))
      }.reduce(_.unionByName(_)).orderBy("o_lo")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH r(o_lo, o_hi, p_lo, p_hi) AS (
        |  VALUES (100, 300, 0, 99), (500, 900, 100, 199))
        |SELECT o_lo, p_lo, count(l_orderkey) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS price,
        |  TRUE AS pruned
        |FROM r LEFT JOIN lineitem
        |  ON l_orderkey BETWEEN o_lo AND o_hi
        |  AND l_partkey BETWEEN p_lo AND p_hi
        |GROUP BY o_lo, p_lo ORDER BY o_lo""".stripMargin,
      headline = true),

    // CDC-APPLY incremental refresh (r10) — q227's algebraic view
    // maintenance fed by q239's snapshot diff: a standing per-flag
    // aggregate materialized at v1 absorbs the v1→v3 row-level delta
    // (insert = ⊕, delete = ⊖, the COW update arrives as both) WITHOUT
    // rescanning the base — the diff reads only the symmetric
    // difference of the manifests. The oracle is a cold recompute of
    // the v3 state plus an independent derivation of the delta mass,
    // so a wrong merge identity or a diff that read too much/little
    // both go red.
    "q253_cdc_apply_refresh" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q253", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") <= 1000)
          .repartitionByRange(3, col("l_returnflag")))
      // standing MV at v1 (decimal measures: exact merge algebra)
      val mv = SnapshotOps.readSnapshot(spark, table, 1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .localCheckpoint()
      SnapshotOps.commitAppend(spark, table,
        base.where(col("l_orderkey") > 1000 &&
          col("l_orderkey") <= 1600).repartitionByRange(3,
          col("l_returnflag")))
      SnapshotOps.commitRewrite(spark, table,
        col("l_returnflag") === "R",
        _.withColumn("l_quantity", col("l_quantity") + 5))
      val delta = SnapshotOps.snapshotDiff(spark, table, 1, 3)
        .withColumn("sgn", when(col("change_type") === "insert", 1L)
          .otherwise(-1L))
        .groupBy("l_returnflag")
        .agg(sum(col("sgn")).as("dn"),
          sum(col("sgn") * col("l_quantity").cast("decimal(18,2)"))
            .as("dqty"),
          count(lit(1)).as("delta_rows"))
      mv.join(delta, Seq("l_returnflag"), "full_outer")
        .select(col("l_returnflag"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n"),
          (coalesce(col("qty"), lit(BigDecimal(0))) +
            coalesce(col("dqty"), lit(BigDecimal(0))))
            .cast("double").as("qty"),
          coalesce(col("delta_rows"), lit(0L)).as("delta_rows"))
        .where(col("n") > 0)
        .orderBy("l_returnflag")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM lineitem WHERE l_orderkey <= 1600),
        |v1r AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_returnflag FROM b WHERE l_orderkey <= 1000),
        |v3r AS (SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'R' THEN l_quantity + 5
        |      ELSE l_quantity END AS l_quantity,
        |    l_returnflag FROM b),
        |cold AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |      AS DOUBLE) AS qty
        |  FROM v3r GROUP BY l_returnflag),
        |dm AS (SELECT l_returnflag FROM
        |    (SELECT * FROM v3r EXCEPT ALL SELECT * FROM v1r) i
        |  UNION ALL SELECT l_returnflag FROM
        |    (SELECT * FROM v1r EXCEPT ALL SELECT * FROM v3r) d),
        |dl AS (SELECT l_returnflag, CAST(count(*) AS BIGINT)
        |    AS delta_rows FROM dm GROUP BY l_returnflag)
        |SELECT cold.l_returnflag, cold.n, cold.qty,
        |  coalesce(dl.delta_rows, 0) AS delta_rows
        |FROM cold LEFT JOIN dl ON cold.l_returnflag = dl.l_returnflag
        |ORDER BY cold.l_returnflag""".stripMargin,
      headline = true),

    // WRITE-AUDIT-PUBLISH (r10): the governance pattern every
    // production ingestion runs — a batch stages on a BRANCH (invisible
    // to main-line readers), the q212 constraint suite audits the
    // branch VIEW (main + staged), and only a clean audit publishes
    // (pure metadata, atomic CAS). The dirty attempt here carries
    // out-of-range quantities: its audit reds, the branch drops, and
    // main's content is BYTE-IDENTICAL to before the attempt (the xor
    // pins that). The clean retry audits green and publishes as v2.
    "q254_write_audit_publish" -> api((spark, sfDir) => {
      import graft.operators.{ConstraintOps, SnapshotOps}
      val table = s"${runScopedDir("/tmp/graft_q254", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val batch = li.where(col("l_orderkey") > 1000 &&
        col("l_orderkey") <= 1200)
      SnapshotOps.commitAppend(spark, table,
        li.where(col("l_orderkey") <= 1000).repartition(4))
      def audit(branch: String): Long =
        ConstraintOps.rowChecks(
          SnapshotOps.readBranch(spark, table, branch),
          Seq("qty_range" -> col("l_quantity").between(1, 50)))
          .agg(sum("violations")).head().getLong(0)
      def mainState(phase: String, violations: Long) =
        SnapshotOps.readLatest(spark, table)
          .agg(count(lit(1)).as("n"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(phase).as("phase"),
            lit(violations).cast("bigint").as("violations"),
            lit(SnapshotOps.currentVersion(table)).cast("int")
              .as("version"), col("n"), col("content_xor"))
      // attempt 1: corrupted quantities (linenumber-1 rows shift out of
      // the 1..50 domain) — audit reds, branch drops, main untouched
      SnapshotOps.stageAppend(spark, table, "ingest",
        batch.withColumn("l_quantity",
          when(col("l_linenumber") === 1, col("l_quantity") + 100)
            .otherwise(col("l_quantity"))))
      val v1 = audit("ingest")
      SnapshotOps.dropBranch(table, "ingest")
      val rejected = mainState("rejected", v1)
      // attempt 2: the clean batch — audit green, publish
      SnapshotOps.stageAppend(spark, table, "ingest", batch)
      val v2 = audit("ingest")
      SnapshotOps.publishBranch(table, "ingest")
      rejected.unionByName(mainState("published", v2))
        .orderBy("phase")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity
        |    FROM lineitem),
        |base AS (SELECT * FROM li WHERE l_orderkey <= 1000),
        |batch AS (SELECT * FROM li
        |  WHERE l_orderkey > 1000 AND l_orderkey <= 1200),
        |pub AS (SELECT * FROM base UNION ALL SELECT * FROM batch),
        |dirty AS (SELECT CAST(count(*) AS BIGINT) AS v FROM batch
        |  WHERE l_linenumber = 1)
        |SELECT 'rejected' AS phase, dirty.v AS violations,
        |  1 AS version, count(*) AS n,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM base, dirty GROUP BY dirty.v
        |UNION ALL
        |SELECT 'published', 0, 2, count(*),
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT)
        |FROM pub
        |ORDER BY phase""".stripMargin,
      headline = true),

    // GOVERNED exactly-once streaming ingestion (r10) — q240's txn
    // sink composed with q254's write-audit-publish gate: every
    // micro-batch stages on a branch, the q212-style audit runs over
    // just that batch, clean batches publish atomically under the
    // per-stream batch watermark and the dirty batch's branch drops —
    // its rows NEVER appear in any main manifest. One chunk (doc_id %
    // 3 = 1, n_chars negated pre-ingest) is dirty by construction; the
    // oracle pins the final main content to exactly the two clean
    // chunks, publish/reject counts, and that the replayed epoch
    // skipped.
    "q255_stream_governed_ingest" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val scratch = s"${runScopedDir("/tmp/graft_q255", sfDir)}/s-" +
        java.util.UUID.randomUUID().toString.take(8)
      val (table, published, rejected, replaySkipped) =
        StreamingOps.streamGovernedSink(spark, sfDir, scratch, chunks = 3)
      SnapshotOps.readLatest(spark, table)
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"),
          count_distinct(col("lang")).as("langs"))
        .select(lit(published).cast("int").as("published"),
          lit(rejected).cast("int").as("rejected"), col("n"),
          col("total_chars"), col("langs"),
          lit(replaySkipped).as("replay_skipped"))
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """SELECT 2 AS published, 1 AS rejected, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |  TRUE AS replay_skipped
        |FROM documents WHERE doc_id % 3 <> 1""".stripMargin,
      headline = true),

    // Streaming media ingestion (r9): PNG files in a drop-zone
    // directory consumed by a binaryFile file STREAM, decoded with the
    // real JDK codec per arriving file, corpus stats maintained as
    // streaming state. Oracle = the different-stack fixture totals
    // (tools/gen_media_fixture.py raw-pixel stats over all 5000
    // images), so streamed ingestion is held to the same cross-stack
    // bar as the batch paths (q54/q192).
    "q210_stream_media_ingest" -> api((spark, _) =>
      StreamingOps.streamMediaIngest(spark),
      """SELECT count(*) AS n_files,
        |  CAST(sum(sum_r) AS BIGINT) AS total_r,
        |  CAST(sum(sum_g) AS BIGINT) AS total_g,
        |  CAST(sum(sum_b) AS BIGINT) AS total_b,
        |  CAST(sum(width * height) AS BIGINT) AS total_px
        |FROM read_parquet('/root/repo/fixtures/media/expected.parquet')"""
        .stripMargin),

    // Z-ORDER layout rewrite (r9) — q196's compaction sibling for
    // multi-dimensional pruning: lineitem rewritten into 16 files
    // range-partitioned + sorted by the bit-interleave of (l_orderkey,
    // l_partkey), so per-file min/max footer boxes are tight in BOTH
    // dimensions. The oracle pins content equality through the
    // rewrite (count + qty sum + order-independent bit_xor checksum,
    // the q196 convention); the layout PROPERTY — a 2-d box query
    // touching far fewer files than a linear sort allows — is
    // measured in SystemOpsSpec, where the filesystem is visible.
    "q211_zorder_layout" -> api((spark, sfDir) => {
      val dir = runScopedDir("/tmp/graft_q211", sfDir)
      graft.operators.LayoutOps.zorderWrite(
        spark.table("lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        "l_orderkey", "l_partkey", s"$dir/zorder", nFiles = 16)
      spark.read.parquet(s"$dir/zorder")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"),
          contentXor("l_orderkey", "l_partkey", "l_quantity")
            .as("content_xor"))
        // Eager 1-row materialization: sever the action-time read of
        // the shared-within-JVM scratch dir (see q194).
        .localCheckpoint()
    },
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_partkey AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM lineitem""".stripMargin,
      headline = true),

    // Data-quality constraint suite (r9, the Deequ-shaped validation
    // gate): seven constraints over lineitem/orders — five row-local
    // predicates folded into ONE aggregate pass (completeness, range,
    // two domain checks, a cross-column rule), uniqueness via its
    // inherent key shuffle, referential integrity via a broadcast
    // anti-join. Violation counts (not booleans) ride in the report.
    // The oracle re-derives every count independently in SQL.
    "q212_quality_constraints" -> api((spark, _) => {
      import graft.operators.ConstraintOps._
      val li = spark.table("lineitem")
      report(Seq(
        rowChecks(li, Seq(
          "li_orderkey_complete" -> col("l_orderkey").isNotNull,
          "li_quantity_range" -> col("l_quantity").between(1, 50),
          "li_returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "li_linestatus_domain" -> col("l_linestatus").isin("O", "F"),
          "li_price_positive" ->
            (col("l_extendedprice") > lit(0)))),
        uniqueCheck(li, "li_pk_unique",
          Seq("l_orderkey", "l_linenumber")),
        refCheck(li, "l_orderkey", spark.table("orders"), "o_orderkey",
          "li_order_fk"))).orderBy("constraint")
    },
      """WITH t AS (
        |  SELECT 'li_orderkey_complete' AS "constraint",
        |    CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT)
        |      AS violations FROM lineitem
        |  UNION ALL
        |  SELECT 'li_quantity_range',
        |    CAST(count(*) FILTER (l_quantity NOT BETWEEN 1 AND 50
        |      OR l_quantity IS NULL) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'li_returnflag_domain',
        |    CAST(count(*) FILTER (l_returnflag NOT IN ('A','N','R')
        |      OR l_returnflag IS NULL) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'li_linestatus_domain',
        |    CAST(count(*) FILTER (l_linestatus NOT IN ('O','F')
        |      OR l_linestatus IS NULL) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'li_price_positive',
        |    CAST(count(*) FILTER (l_extendedprice <= 0
        |      OR l_extendedprice IS NULL) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'li_pk_unique',
        |    CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) FROM (
        |      SELECT count(*) AS cnt FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'li_order_fk',
        |    CAST(count(*) AS BIGINT) FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |)
        |SELECT "constraint", violations, violations = 0 AS passed
        |FROM t ORDER BY "constraint"""".stripMargin),

    // Parquet write→read roundtrip (COPY TO / file-as-table, S11/S12).
    "q57_copy_parquet" -> api((spark, _) => {
      val dir = tmp("graft_copy_parquet") + "/part.parquet"
      spark.table("part").write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).orderBy("p_partkey")
    }, "SELECT * FROM part ORDER BY p_partkey"),

    // ORC write→read roundtrip: the same sink/source contract as q57 on
    // Spark's other native columnar format (predicate pushdown + column
    // pruning work identically on the read side).
    "q117_copy_orc" -> api((spark, _) => {
      val dir = tmp("graft_copy_orc") + "/part.orc"
      spark.table("part").write.mode("overwrite").orc(dir)
      spark.read.orc(dir).orderBy("p_partkey")
    }, "SELECT * FROM part ORDER BY p_partkey"),

    // Stream-static enrichment join (broadcast dim into each micro-batch,
    // no join state); oracle = the batch join+agg over the same files.
    "q119_stream_enrich" -> api(
      (spark, sfDir) => StreamingOps.enrichedStreamAgg(spark, sfDir),
      """SELECT c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    // CSV roundtrip with explicit schema on re-read (S5/S8).
    "q58_copy_csv" -> api((spark, _) => {
      val dir = tmp("graft_copy_csv") + "/supplier.csv"
      spark.table("supplier").write.mode("overwrite")
        .option("header", "true").csv(dir)
      spark.read.schema(spark.table("supplier").schema)
        .option("header", "true").csv(dir).orderBy("s_suppkey")
    }, "SELECT * FROM supplier ORDER BY s_suppkey"),

    // JSON roundtrip (S6/S13).
    "q59_copy_json" -> api((spark, _) => {
      val dir = tmp("graft_copy_json") + "/nation.json"
      spark.table("nation").write.mode("overwrite").json(dir)
      spark.read.schema(spark.table("nation").schema).json(dir)
        .orderBy("n_nationkey")
    }, "SELECT * FROM nation ORDER BY n_nationkey"),

    // Backward as-of join (DuckDB ASOF JOIN): each click enriched with
    // the user's most recent purchase at-or-before it. Spark lacks the
    // operator; AsOfJoin composes it as union + one window pass (one
    // key shuffle, no inequality-join blowup) — value-checked against
    // DuckDB's native ASOF JOIN.
    // The oracle pre-dedupes purchases to one row per (user, ts)
    // keeping the max event_id, because at equal timestamps DuckDB's
    // ASOF pick is arbitrary. The Spark side needs NO dedup pass:
    // AsOfJoin's carry tie-break (last right row at equal (key, t),
    // ordered by payload) already selects the max (purchase_id, value)
    // struct — the same row — so the extra window shuffle is skipped
    // (verified row-identical at sf0.1).
    "q74_asof_join" -> api((spark, _) => {
      val ev = spark.table("events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("purchase_id"), col("value"))
      graft.operators.AsOfJoin.asofBackward(clicks, purchases,
          "user_id", "ts", "pts", Seq("purchase_id", "value"))
        .select(col("event_id"), col("purchase_id"),
          col("value").as("purchase_value"))
        .orderBy("event_id")
    },
      """WITH clicks AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, ts, event_id AS purchase_id, value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, purchase_id, value FROM p0 WHERE rn = 1)
        |SELECT c.event_id, p.purchase_id, p.value AS purchase_value
        |FROM clicks c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY event_id""".stripMargin,
      headline = true),

    // Forward as-of join (q74's mirror): each click enriched with the
    // user's NEXT purchase at-or-after it — same union + one-window-pass
    // composition, scanning time in reverse. As in q74, only the oracle
    // pre-dedupes per (user, ts); the carry tie-break picks the same
    // max-payload row without the extra window shuffle.
    "q96_asof_forward" -> api((spark, _) => {
      val ev = spark.table("events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("purchase_id"), col("value"))
      graft.operators.AsOfJoin.asofForward(clicks, purchases,
          "user_id", "ts", "pts", Seq("purchase_id", "value"))
        .select(col("event_id"), col("purchase_id"),
          col("value").as("purchase_value"))
        .orderBy("event_id")
    },
      """WITH clicks AS (SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, ts, event_id AS purchase_id, value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, purchase_id, value FROM p0 WHERE rn = 1)
        |SELECT c.event_id, p.purchase_id, p.value AS purchase_value
        |FROM clicks c ASOF JOIN p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY event_id""".stripMargin),

    // Attribution-window range join: clicks within 30 min before each
    // purchase of the same user — equi-join on the user plus a time-range
    // predicate (the keyed range-join shape; the keyless variant is
    // RangeJoin + RangeJoinSpec). Plain SQL on both engines.
    "q75_attribution_window" -> same(
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin),

    // Keyless range join through the OPTIMIZER RULE (BinnedRangeJoinRule
    // + BinnedRangeJoinRuleSpec): the plain-SQL BETWEEN join below would
    // plan as a quadratic BroadcastNestedLoopJoin; with the rule armed it
    // plans as the binned equi-join (points project a bin id, intervals
    // explode onto covered bins, exact band re-filter). cache+count
    // forces planning/execution while the conf is armed, so the driver
    // gate values the rule's output, not the fallback; the conf is
    // disarmed before returning so no other entry's plan is touched.
    "q153_range_join_rule" -> api((spark, _) => {
      graft.plans.BinnedRangeJoinRule.install(spark)
      spark.conf.set(graft.plans.BinnedRangeJoinRule.WidthConf, "500")
      try {
        // the previous invocation's pinned result is released first, so
        // repeat runs hold at most one copy (no unbounded cache leak)
        val view = "graft_q153_cache"
        if (spark.catalog.tableExists(view)) {
          spark.table(view).unpersist()
          spark.catalog.dropTempView(view)
        }
        val df = spark.sql(
          """SELECT s_suppkey, p_partkey, p_retailprice
            |FROM supplier JOIN part
            |  ON p_retailprice BETWEEN s_acctbal AND s_acctbal + 500
            |ORDER BY s_suppkey, p_partkey""".stripMargin)
        df.cache().count()
        df.createOrReplaceTempView(view)
        df
      } finally spark.conf.unset(graft.plans.BinnedRangeJoinRule.WidthConf)
    },
      """SELECT s_suppkey, p_partkey, p_retailprice
        |FROM supplier JOIN part
        |  ON p_retailprice BETWEEN s_acctbal AND s_acctbal + 500
        |ORDER BY s_suppkey, p_partkey""".stripMargin),

    // Data-layout optimization: hive-partitioned write (S11) + a read
    // whose filter prunes to one partition directory — the layout that
    // turns a 100 TB scan into a per-language scan. QueriesSpec asserts
    // PartitionFilters in the plan; the oracle checks the values.
    "q71_partition_pruned_read" -> api((spark, _) => {
      val base = Files.createTempDirectory("graft_layout")
      base.toFile.deleteOnExit()
      val dir = base.toString + "/docs_by_lang"
      // write only the columns the read consumes — shipping the full
      // text payload into a layout no one reads is pure write cost
      spark.table("documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      spark.read.parquet(dir).where(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin),

    // MERGE upsert (the daily-dimension-refresh shape): updates land on
    // matched keys, new keys append — one left join + one anti join, both
    // shuffle-free when the delta broadcasts. DuckDB 1.0 has no MERGE, so
    // the oracle computes the merged state directly; the Engine command
    // is value-checked against it end-to-end.
    "q87_merge_upsert" -> api((spark, _) => {
      val e = new Engine(spark)
      e.register("acct", spark.table("customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")))
      e.register("delta", spark.sql(
        """SELECT c_custkey AS k, c_name AS nm,
          |  round(c_acctbal + 100, 2) AS bal
          |FROM customer WHERE c_custkey % 3 = 0
          |UNION ALL
          |SELECT c_custkey + 1000000 AS k, concat('new_', c_custkey) AS nm,
          |  CAST(1.5 AS DOUBLE) AS bal
          |FROM customer WHERE c_custkey < 5""".stripMargin))
      e.executeDuck(
        """MERGE INTO acct USING delta ON acct.c_custkey = delta.k
          |WHEN MATCHED THEN UPDATE SET c_acctbal = delta.bal
          |WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal)
          |VALUES (delta.k, delta.nm, delta.bal)""".stripMargin)
      // materialize (the frame lazily reads the engine's snapshot
      // files), then reclaim the first-DML materialization dir
      val out = e.table("acct").orderBy("c_custkey").localCheckpoint()
      try out finally e.close()
    },
      """WITH delta AS (
        |  SELECT c_custkey AS k, c_name AS nm,
        |    round(c_acctbal + 100, 2) AS bal
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS k, 'new_' || c_custkey AS nm,
        |    CAST(1.5 AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey < 5),
        |upd AS (
        |  SELECT c.c_custkey, c.c_name,
        |    CASE WHEN d.k IS NOT NULL THEN d.bal ELSE c.c_acctbal END
        |      AS c_acctbal
        |  FROM customer c LEFT JOIN delta d ON c.c_custkey = d.k),
        |ins AS (
        |  SELECT d.k AS c_custkey, d.nm AS c_name, d.bal AS c_acctbal
        |  FROM delta d LEFT JOIN customer c ON c.c_custkey = d.k
        |  WHERE c.c_custkey IS NULL)
        |SELECT * FROM upd UNION ALL SELECT * FROM ins
        |ORDER BY c_custkey""".stripMargin),

    // Recursive CTE (WITH RECURSIVE): Spark has no plan-level recursion,
    // so IterativeOps drives semi-naive iteration over checkpointed
    // frontiers — value-checked against DuckDB's native WITH RECURSIVE.
    // The hierarchy is synthetic (parent = custkey div 10), giving every
    // customer a depth and a root in ≤4 rounds.
    "q88_recursive_hierarchy" -> api((spark, _) => {
      val cust = spark.table("customer").select(col("c_custkey"))
      val base = cust.where(col("c_custkey") < 10)
        .select(col("c_custkey").as("k"), lit(0).as("depth"),
          col("c_custkey").as("root"))
      graft.operators.IterativeOps.recursiveUnionAll(base, f =>
        cust.where(col("c_custkey") >= 10)
          .join(f, expr("(c_custkey div 10) = k"))
          .select(col("c_custkey").as("k"),
            (col("depth") + 1).as("depth"), col("root")))
        .orderBy("k")
    },
      """WITH RECURSIVE r AS (
        |  SELECT c_custkey AS k, 0 AS depth, c_custkey AS root
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey AS k, r.depth + 1 AS depth, r.root AS root
        |  FROM customer c JOIN r ON c.c_custkey // 10 = r.k
        |  WHERE c.c_custkey >= 10)
        |SELECT k, depth, root FROM r ORDER BY k""".stripMargin),

    // Stream-stream interval join (attribution window as a stream):
    // watermarked both sides, event-time-bounded join state. Oracle =
    // the batch range join over the same files (q75's shape).
    "q86_stream_interval_join" -> api(
      (spark, sfDir) => StreamingOps.streamIntervalJoin(spark, sfDir, 30),
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin),

    // Streaming count-min sketch: per-hour 4×512 counter cells kept as
    // streaming state (sketch-sized, not key-cardinality-sized), then
    // each hour's exact top-3 users scored against the drained sketch.
    // Integer counts make stream == batch sketch exact at any
    // micro-batch slicing, so the whole thing is oracle-checkable:
    // DuckDB builds the identical sketch in SQL.
    "q162_stream_countmin" -> api(
      (spark, sfDir) => StreamingOps.streamingCountMin(spark, sfDir),
      """WITH e AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |    user_id FROM events),
        |tj AS (SELECT hour, user_id, unnest([0, 1, 2, 3]) AS j FROM e),
        |h AS (SELECT hour, j,
        |    ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' ||
        |      CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 512 AS c
        |  FROM tj),
        |cells AS (SELECT hour, j, c, count(*) AS n FROM h
        |          GROUP BY hour, j, c),
        |ex AS (SELECT hour, user_id, count(*) AS exact_n FROM e
        |       GROUP BY hour, user_id),
        |top AS (SELECT hour, user_id, exact_n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY hour
        |    ORDER BY exact_n DESC, user_id) AS rn FROM ex) z
        |  WHERE rn <= 3),
        |tj2 AS (SELECT hour, user_id, exact_n, unnest([0, 1, 2, 3]) AS j
        |        FROM top),
        |lk AS (SELECT hour, user_id, exact_n, j,
        |    ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' ||
        |      CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 512 AS c
        |  FROM tj2)
        |SELECT lk.hour, lk.user_id,
        |  CAST(max(lk.exact_n) AS BIGINT) AS exact_n,
        |  CAST(min(cells.n) AS BIGINT) AS cms_est
        |FROM lk JOIN cells ON lk.hour = cells.hour
        |  AND lk.j = cells.j AND lk.c = cells.c
        |GROUP BY lk.hour, lk.user_id
        |ORDER BY lk.hour, exact_n DESC, lk.user_id""".stripMargin),

    // H7 parse/bind validation over a fixed statement battery, pinned to
    // DuckDB's OWN classification of the same statements: the oracle
    // fixture is produced by tools/validator_oracle.py running `EXPLAIN
    // <stmt>` in DuckDB (parse + bind, no execution — a runtime-only
    // failure like CAST('zzz' AS INT) is valid, syntax/catalog/column
    // errors are invalid). The battery here and in the tool must stay in
    // sync — drift fails this gate loudly. ValidatorSpec still pins the
    // engine-side semantics.
    "q67_validate_sql" -> api((spark, _) => {
      import spark.implicits._
      val engine = new Engine(spark)
      Tables.names.foreach(n => engine.register(n, spark.table(n)))
      val battery = Seq(
        "s01_ok_select" -> "SELECT count(*) FROM lineitem",
        "s02_ok_join" ->
          "SELECT c_name FROM customer JOIN orders ON o_custkey = c_custkey",
        "s03_bad_syntax" -> "SELEC model FROM part",
        "s04_bad_table" -> "SELECT * FROM no_such_table",
        "s05_bad_column" -> "SELECT not_a_column FROM part",
        "s06_ok_ddl" -> "CREATE TABLE v_tmp AS SELECT 1 AS x",
        "s07_runtime_ok" -> "SELECT CAST('zzz' AS INT) FROM part")
      SqlValidator.validateAll(engine, battery)
        .toDF("stmt_id", "valid").orderBy("stmt_id")
    },
      """SELECT stmt_id, valid FROM
        |  read_parquet('/root/repo/fixtures/validator_expected.parquet')
        |ORDER BY stmt_id""".stripMargin),

    // H5 — the LLM orchestration loop with the network transport
    // replaced by the deterministic EchoClient: prompt construction
    // (rajkumar formatter over the region schema), batched dispatch,
    // stop-sequence truncation and character-usage accounting are ALL
    // exercised and value-checked — the oracle rebuilds the exact
    // prompt strings (the formatter's constants, newlines via chr(10))
    // and the echo completion in plain SQL. The real HTTP transport
    // (HttpGenerationClient) exists behind spark.graft.llm.endpoint —
    // clientFromConf resolves to EchoClient in this offline session, so
    // the oracle stays deterministic.
    "q183_llm_orchestration" -> api((spark, _) =>
      graft.operators.LlmOrchestrator.textToSql(
        spark.table("documents").select(col("doc_id"), col("text")),
        "doc_id", "text", "rajkumar",
        Seq(("region", spark.table("region").schema)),
        graft.operators.LlmOrchestrator.clientFromConf(spark))
        .orderBy("doc_id"),
      """WITH p AS (
        |  SELECT doc_id,
        |    'CREATE TABLE region (' || chr(10) ||
        |    '    r_regionkey INTEGER,' || chr(10) ||
        |    '    r_name VARCHAR' || chr(10) || ')' ||
        |    chr(10) || chr(10) || chr(10) ||
        |    '-- Using valid DuckDB SQL, answer the following question ' ||
        |    'for the tables provided above.' || chr(10) || chr(10) ||
        |    '-- ' || text || chr(10) AS prompt
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, prompt,
        |    'SELECT ' || CAST(length(prompt) AS VARCHAR)
        |      || ' AS prompt_len;' || chr(10)
        |      || '-- max_tokens=300 beams=1' AS raw
        |  FROM p)
        |SELECT doc_id,
        |  string_split(string_split(raw, ';')[1], chr(10))[1] AS sql,
        |  CAST(length(prompt) AS BIGINT) AS prompt_chars,
        |  CAST(length(raw) AS BIGINT) AS completion_chars,
        |  CAST(length(prompt) + length(raw) AS BIGINT) AS total_chars
        |FROM r ORDER BY doc_id""".stripMargin, headline = true),

    // H5, chat path — the reference's DuckDBChat message-list branch:
    // 4-message conversation construction (system / schema-ask /
    // assistant-summary / final question), batched dispatch through the
    // injectable chat transport, stop truncation. The EchoChatClient
    // derives its completion from the question text alone (extracted
    // between the template's backticks — documents.text is
    // backtick-free, the assumption EchoChatClient requires), so the
    // oracle needs no embedded template constants — it rebuilds the
    // completion straight from documents.text. chatClientFromConf picks
    // the HTTP chat transport only when spark.graft.llm.chat_endpoint
    // is set, never in this offline session.
    "q184_llm_chat_orchestration" -> api((spark, _) =>
      graft.operators.LlmOrchestrator.textToSqlChat(
        spark.table("documents").select(col("doc_id"), col("text")),
        "doc_id", "text",
        Seq(("region", spark.table("region").schema)),
        graft.operators.LlmOrchestrator.chatClientFromConf(spark))
        .orderBy("doc_id"),
      """WITH r AS (
        |  SELECT doc_id,
        |    'SELECT ' || CAST(length(text) AS VARCHAR)
        |      || ' AS q_len;' || chr(10) || '-- chat beams=1' AS raw
        |  FROM documents)
        |SELECT doc_id, CAST(4 AS BIGINT) AS n_messages,
        |  string_split(string_split(raw, ';')[1], chr(10))[1] AS sql,
        |  CAST(length(raw) AS BIGINT) AS completion_chars
        |FROM r ORDER BY doc_id""".stripMargin),

    // RAG rerank loop (r9): BM25 candidate retrieval (q204) → one LLM
    // scoring call per candidate through the SAME injectable transport
    // as q183 (EchoClient offline; HttpGenerationClient behind
    // spark.graft.llm.endpoint) → parse the score out of the raw
    // completion → rerank. Exercises the full retrieval→score→rerank
    // plumbing with the model stubbed at the transport seam, the
    // orchestration convention throughout (the echo score is the
    // prompt length, so the oracle re-derives it from the prompt
    // template + text). Candidate set is top-10, so the rerank window
    // is trivially bounded; at scale the per-QUERY candidate list stays
    // k-sized regardless of corpus size — rerank cost is queries×k
    // calls, never corpus-sized.
    "q217_llm_rerank" -> api((spark, _) => {
      import org.apache.spark.sql.expressions.Window
      val docs = spark.table("documents")
      val cand = graft.operators.RetrievalOps.bm25TopN(docs, "doc_id",
          "text", Seq("hash", "join", "merge", "filter"), n = 10)
        .select(col("doc_id"), col("rn").cast("long").as("bm25_rn"))
      val prompted = cand
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), col("bm25_rn"),
          concat(lit("-- Rate the relevance of the passage to " +
            "\"hash join merge filter\": "), col("text")).as("prompt"))
      graft.operators.LlmOrchestrator.completePrompts(prompted, "prompt",
          graft.operators.LlmOrchestrator.clientFromConf(spark))
        .select(col("doc_id"), col("bm25_rn"),
          regexp_extract(col("raw_output"), "SELECT (\\d+) AS prompt_len", 1)
            .cast("long").as("llm_score"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("llm_score").desc, col("doc_id"))))
        .orderBy("rn")
    },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |  FROM documents),
        |lens AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl
        |  FROM w),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl
        |  FROM lens),
        |tf AS (SELECT doc_id, t AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(words) AS t FROM w)
        |  WHERE t IN ('hash', 'join', 'merge', 'filter')
        |  GROUP BY doc_id, t),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (SELECT tf.doc_id,
        |    round(sum(
        |      ln(1.0 + (CAST(s.n_docs AS DOUBLE) - df.df + 0.5)
        |        / (CAST(df.df AS DOUBLE) + 0.5)) *
        |      (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0) /
        |        (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |          CAST(lens.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE)
        |          / CAST(s.sum_dl AS DOUBLE))))), 6) AS score,
        |    count(*) AS n_terms_hit
        |  FROM tf JOIN df USING (term) JOIN lens USING (doc_id)
        |  CROSS JOIN stats s
        |  GROUP BY tf.doc_id),
        |top AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS bm25_rn
        |  FROM scored ORDER BY score DESC, doc_id LIMIT 10),
        |sc AS (SELECT t.doc_id, t.bm25_rn,
        |    CAST(length('-- Rate the relevance of the passage to ' ||
        |      '"hash join merge filter": ' || d.text) AS BIGINT)
        |      AS llm_score
        |  FROM top t JOIN documents d ON t.doc_id = d.doc_id)
        |SELECT doc_id, bm25_rn, llm_score,
        |  row_number() OVER (ORDER BY llm_score DESC, doc_id) AS rn
        |FROM sc ORDER BY rn""".stripMargin,
      headline = true),

    // MANIFEST-GROUP planning (r11) — the observable of the two-tier
    // manifest (Iceberg's manifest-list level, SnapshotOps groups):
    // three range-partitioned commits land as three GROUP lines whose
    // aggregated envelopes cover disjoint key ranges, so a range read
    // touching one commit's range expands exactly ONE group — the
    // other two are skipped as single unparsed manifest lines. The
    // oracle pins both the planning counts (3 groups, 1 expanded —
    // deterministic from the commit structure) and the content of the
    // pruned read; file-level laziness and scan-index equality are
    // spec-asserted in SnapshotOpsSpec where the filesystem is
    // visible.
    "q256_manifest_group_planning" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q256", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      Seq((1L, 500L), (501L, 1000L), (1001L, 1500L)).foreach {
        case (lo, hi) =>
          SnapshotOps.commitAppend(spark, table,
            li.where(col("l_orderkey").between(lo, hi))
              .repartitionByRange(3, col("l_orderkey")),
            statsCols = Seq("l_orderkey"))
      }
      val (groupsTotal, groupsExpanded, _, _) =
        SnapshotOps.rangeStats(table, 3, "l_orderkey", 1, 500)
      SnapshotOps.readSnapshotRange(spark, table, 3, "l_orderkey", 1, 500)
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("qty"),
          contentXor("l_orderkey", "l_linenumber", "l_quantity")
            .as("content_xor"))
        .select(lit(groupsTotal).cast("long").as("groups_total"),
          lit(groupsExpanded).cast("long").as("groups_expanded"),
          col("n"), col("qty"), col("content_xor"))
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """SELECT CAST(3 AS BIGINT) AS groups_total,
        |  CAST(1 AS BIGINT) AS groups_expanded,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM lineitem WHERE l_orderkey BETWEEN 1 AND 500""".stripMargin,
      headline = true),

    // SQL DML on the snapshot layer (r11) — the Engine's regex front
    // end executing a full CREATE→INSERT→UPDATE→DELETE→MERGE lifecycle
    // with every mutation a COMMITTED snapshot version underneath
    // (INSERT = manifest-union append, UPDATE/DELETE = file-granular
    // COW, key-shaped MERGE = committed upsert). The `versions` column
    // is read from the table's own manifest chain — 4 statements, 4
    // committed versions — and the final content is re-derived by the
    // oracle from `customer` alone. Commit/reuse counts are
    // spec-asserted in EngineSpec.
    "q257_sql_dml_snapshot" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val e = new Engine(spark)
      e.executeDuck(
        "CREATE TABLE g257_acct (id INTEGER, bal DOUBLE, seg VARCHAR)")
      e.executeDuck(
        """INSERT INTO g257_acct
          |SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
          |WHERE c_custkey <= 200""".stripMargin)
      e.executeDuck(
        "UPDATE g257_acct SET bal = bal + 100 WHERE seg = 'BUILDING'")
      e.executeDuck("DELETE FROM g257_acct WHERE bal < 0")
      e.executeDuck(
        """CREATE TABLE g257_delta AS
          |SELECT c_custkey AS id, c_acctbal AS nb, c_mktsegment AS ns
          |FROM customer WHERE c_custkey BETWEEN 150 AND 250""".stripMargin)
      e.executeDuck(
        """MERGE INTO g257_acct USING g257_delta
          |ON g257_acct.id = g257_delta.id
          |WHEN MATCHED THEN UPDATE SET bal = g257_delta.nb
          |WHEN NOT MATCHED THEN INSERT (id, bal, seg)
          |VALUES (g257_delta.id, g257_delta.nb, g257_delta.ns)"""
          .stripMargin)
      val versions = e.snapshotDir("g257_acct")
        .map(SnapshotOps.currentVersion).getOrElse(0)
      // r13: retention closes the lifecycle — expire all but the last
      // 2 versions (a metadata drop + orphan-file GC), then prove the
      // surviving chain is exactly 2 versions long and current content
      // is untouched (the oracle re-derives it below)
      val expired = e.executeDuck(
        "PRAGMA expire_snapshots('g257_acct', 2)")
        .collect()(0).getLong(0)
      val retainedVersions = e.executeDuck(
        "PRAGMA table_snapshots('g257_acct')").count()
      val out = e.executeDuck(
        """SELECT seg, count(*) AS n FROM g257_acct GROUP BY seg""")
        .select(col("seg"), col("n"))
        .join(e.table("g257_acct")
          .agg(sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total")))
        .select(col("seg"), col("n").cast("long").as("n"),
          col("bal_total"), lit(versions).cast("long").as("versions"),
          lit(expired).as("versions_expired"),
          lit(retainedVersions).as("versions_retained"))
        .orderBy("seg")
        .localCheckpoint()
      // the result is materialized — reclaim the engine's first-DML
      // snapshot materializations (Bench runs this entry every pass;
      // without close() each run leaks a table copy into the temp dir)
      try out finally e.close()
    },
      """WITH base AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer WHERE c_custkey <= 200),
        |upd AS (SELECT id, CASE WHEN seg = 'BUILDING' THEN bal + 100
        |    ELSE bal END AS bal, seg FROM base),
        |del AS (SELECT * FROM upd WHERE NOT (bal < 0)),
        |delta AS (SELECT c_custkey AS id, c_acctbal AS nb,
        |    c_mktsegment AS ns FROM customer
        |  WHERE c_custkey BETWEEN 150 AND 250),
        |merged AS (
        |  SELECT d.id, coalesce(x.nb, d.bal) AS bal, d.seg
        |  FROM del d LEFT JOIN delta x ON d.id = x.id
        |  UNION ALL
        |  SELECT x.id, x.nb AS bal, x.ns AS seg
        |  FROM delta x LEFT JOIN del d ON d.id = x.id
        |  WHERE d.id IS NULL),
        |tot AS (SELECT CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS bal_total FROM merged)
        |SELECT seg, count(*) AS n, tot.bal_total,
        |  CAST(4 AS BIGINT) AS versions,
        |  CAST(2 AS BIGINT) AS versions_expired,
        |  CAST(2 AS BIGINT) AS versions_retained
        |FROM merged CROSS JOIN tot
        |GROUP BY seg, tot.bal_total ORDER BY seg""".stripMargin,
      headline = true),

    // MERGE-ON-READ deletion vectors (r11) — the Iceberg-v2/Delta DV
    // model: a selective delete on a large table writes O(matched
    // rows) of (file, position) metadata instead of rewriting
    // O(touched files' bytes) of data. The entry pins the THREE
    // observables that define MOR: (stage 'mor') the delete's commit
    // rewrote ZERO data files yet reads see the deletes and the
    // metadata-only count agrees; (stage 'compacted') compaction pays
    // the DV debt — zero `!` lines survive — with content unchanged.
    // Consolidation and diff semantics are spec-asserted in
    // SnapshotOpsSpec where the filesystem is visible.
    "q258_mor_delete" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q258", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .where(col("l_orderkey") <= 1200)
      SnapshotOps.commitAppend(spark, table,
        li.repartitionByRange(4, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      val del = SnapshotOps.commitDelete(spark, table,
        col("l_quantity") <= 5.0)
      val (_, dvRows) = SnapshotOps.deleteStats(table, del.version)
      def content(stage: String, dv: Long, rewrote: Long) =
        SnapshotOps.readLatest(spark, table)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(stage).as("stage"), col("n"), col("qty"),
            col("content_xor"), lit(dv).cast("long").as("dv_rows"),
            lit(rewrote).cast("long").as("files_rewritten"))
      val mor = content("mor", dvRows, del.written.toLong)
      val cc = SnapshotOps.commitCompact(spark, table, 2)
      val (_, dvAfter) = SnapshotOps.deleteStats(table, cc.version)
      val compacted = content("compacted", dvAfter, cc.written.toLong)
      mor.unionByName(compacted).orderBy("stage")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH live AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |  WHERE l_orderkey <= 1200 AND NOT (l_quantity <= 5.0)),
        |dv AS (
        |  SELECT count(*) AS n_del FROM lineitem
        |  WHERE l_orderkey <= 1200 AND l_quantity <= 5.0),
        |agg AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    bit_xor(('0x' || substring(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |  FROM live)
        |SELECT 'compacted' AS stage, n, qty, content_xor,
        |  CAST(0 AS BIGINT) AS dv_rows, CAST(2 AS BIGINT) AS files_rewritten
        |FROM agg
        |UNION ALL
        |SELECT 'mor' AS stage, n, qty, content_xor,
        |  dv.n_del AS dv_rows, CAST(0 AS BIGINT) AS files_rewritten
        |FROM agg CROSS JOIN dv
        |ORDER BY stage""".stripMargin, headline = true),

    // STREAMING CDC-APPLY sink (r11) — the "merge a change stream into
    // a table" pattern: two ordered change waves (initial balances,
    // then a +50 correction for a key prefix) each land as ONE
    // committed upsert version under a per-stream txn watermark; a
    // replayed epoch skips before reading a byte. The oracle re-derives
    // the final upserted state from `customer` alone; versions (2 =
    // one per wave), file reuse during the merge wave, and the replay
    // skip ride as pinned columns.
    "q259_stream_upsert_sink" -> api((spark, sfDir) => {
      val scratch = s"${runScopedDir("/tmp/graft_q259", sfDir)}/u-" +
        java.util.UUID.randomUUID().toString.take(8)
      val (table, versions, reusedAny, replaySkipped) =
        StreamingOps.streamUpsertSink(spark, sfDir, scratch,
          n = 250, updN = 100)
      graft.operators.SnapshotOps.readLatest(spark, table)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("seg"), col("n"), col("bal_total"),
          lit(versions).cast("long").as("versions"),
          lit(if (reusedAny) 1L else 0L).as("reused_any"),
          lit(if (replaySkipped) 1L else 0L).as("replay_skipped"))
        .orderBy("seg")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH fin AS (
        |  SELECT c_mktsegment AS seg,
        |    c_acctbal + CASE WHEN c_custkey <= 100 THEN 50.0 ELSE 0.0
        |      END AS bal
        |  FROM customer WHERE c_custkey <= 250)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(2 AS BIGINT) AS versions,
        |  CAST(1 AS BIGINT) AS reused_any,
        |  CAST(1 AS BIGINT) AS replay_skipped
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
      headline = true),

    // MERGE-ON-READ update (r11) — q258's dual for UPDATE: matched
    // rows' positions become a deletion vector and the updated rows
    // append as new files in ONE commit, zero data files rewritten
    // (base_files_kept pins that every v1 file is still in the v2
    // manifest). Compaction folds the whole MOR state — DV plus
    // appended updates — into plain files with content unchanged.
    "q260_mor_update" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q260", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .where(col("l_orderkey") <= 1200)
      SnapshotOps.commitAppend(spark, table,
        li.repartitionByRange(4, col("l_orderkey")),
        statsCols = Seq("l_orderkey"))
      val filesV1 = SnapshotOps.snapshotFiles(table, 1).toSet
      val up = SnapshotOps.commitUpdateMoR(spark, table,
        col("l_quantity") <= 3.0,
        _.withColumn("l_quantity", col("l_quantity") + lit(100.0)))
      val (_, dvRows) = SnapshotOps.deleteStats(table, up.version)
      val kept =
        if (filesV1.subsetOf(
          SnapshotOps.snapshotFiles(table, up.version).toSet)) 1L else 0L
      def content(stage: String, dv: Long) =
        SnapshotOps.readLatest(spark, table)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"),
            contentXor("l_orderkey", "l_linenumber", "l_quantity")
              .as("content_xor"))
          .select(lit(stage).as("stage"), col("n"), col("qty"),
            col("content_xor"), lit(dv).cast("long").as("dv_rows"),
            lit(kept).as("base_files_kept"))
      val mor = content("mor", dvRows)
      val cc = SnapshotOps.commitCompact(spark, table, 2)
      val (_, dvAfter) = SnapshotOps.deleteStats(table, cc.version)
      val compacted = content("compacted", dvAfter)
      mor.unionByName(compacted).orderBy("stage")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH upd AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_quantity <= 3.0 THEN l_quantity + 100.0
        |      ELSE l_quantity END AS l_quantity
        |  FROM lineitem WHERE l_orderkey <= 1200),
        |dv AS (
        |  SELECT count(*) AS n_upd FROM lineitem
        |  WHERE l_orderkey <= 1200 AND l_quantity <= 3.0),
        |agg AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    bit_xor(('0x' || substring(md5(
        |      CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(l_quantity AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |  FROM upd)
        |SELECT 'compacted' AS stage, n, qty, content_xor,
        |  CAST(0 AS BIGINT) AS dv_rows, CAST(1 AS BIGINT) AS base_files_kept
        |FROM agg
        |UNION ALL
        |SELECT 'mor' AS stage, n, qty, content_xor,
        |  dv.n_upd AS dv_rows, CAST(1 AS BIGINT) AS base_files_kept
        |FROM agg CROSS JOIN dv
        |ORDER BY stage""".stripMargin, headline = true),

    // n-D COMMITTED CLUSTERING (r11) — commitClusterN generalizes q252
    // to three dimensions: the rewrite sorts by the 3-column Morton
    // interleave and the manifest records per-file bounds on ALL three,
    // so a 3-sided box read prunes from metadata and the residual
    // conjunction pins exactness. The oracle re-derives the box content
    // from lineitem; pruning effectiveness (sampling-dependent file
    // counts) is spec-asserted in SnapshotOpsSpec, not oracle-pinned.
    "q261_zorder_nd" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q261", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val li = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .where(col("l_orderkey") <= 1500)
      SnapshotOps.commitAppend(spark, table, li.repartition(4),
        statsCols = Seq("l_orderkey"))
      SnapshotOps.commitClusterN(spark, table,
        Seq("l_orderkey", "l_linenumber", "l_partkey"),
        nFiles = 8, bits = 16)
      val box = Seq(
        ("l_orderkey", BigDecimal(100), BigDecimal(300)),
        ("l_linenumber", BigDecimal(1), BigDecimal(3)),
        ("l_partkey", BigDecimal(1), BigDecimal(100)))
      SnapshotOps.readSnapshotBox(spark, table, 2, box)
        .agg(count(lit(1)).as("n"),
          sum(col("l_partkey").cast("decimal(18,0)"))
            .cast("double").as("pk_sum"),
          contentXor("l_orderkey", "l_linenumber", "l_partkey")
            .as("content_xor"))
        .select(lit(2L).as("versions"), col("n"), col("pk_sum"),
          col("content_xor"))
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """SELECT CAST(2 AS BIGINT) AS versions, count(*) AS n,
        |  CAST(sum(CAST(l_partkey AS DECIMAL(18,0))) AS DOUBLE) AS pk_sum,
        |  bit_xor(('0x' || substring(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' ||
        |    CAST(l_linenumber AS VARCHAR) || '|' ||
        |    CAST(l_partkey AS VARCHAR)), 1, 12))::BIGINT) AS content_xor
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 300
        |  AND l_linenumber BETWEEN 1 AND 3
        |  AND l_partkey BETWEEN 1 AND 100""".stripMargin),

    // STREAMING SNAPSHOT SOURCE (r12) — the subscribe verb that closes
    // the table-format axis: q240/q255/q259 write committed versions
    // from streams; this entry READS them as a stream (Delta
    // readStream / Iceberg incremental-scan streaming). Offsets are
    // table versions, each micro-batch IS readAppendsSince(from, to),
    // progress lives in the checkpoint offset log. Three contracts
    // pinned in one pass: (1) version-granular batches under
    // maxVersionsPerBatch=1 drain exactly the three append waves;
    // (2) a MOR delete of already-consumed rows REFUSES the next span
    // (fail-fast, never silently wrong — rewrite_refused pins it);
    // (3) a fresh subscriber's first batch is the full VISIBLE
    // snapshot, deletion vectors applied — whose content the oracle
    // re-derives from customer.
    "q262_stream_snapshot_source" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      import graft.streaming.SnapshotStream
      val scratch = s"${runScopedDir("/tmp/graft_q262", sfDir)}/s-" +
        java.util.UUID.randomUUID().toString.take(8)
      val table = s"$scratch/table"
      val cust = spark.table("customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
      def wave(lo: Int, hi: Int) = // half-open: c_custkey starts at 0
        cust.where(col("id") >= lo && col("id") < hi)
      SnapshotOps.commitAppend(spark, table, wave(0, 50),
        statsCols = Seq("id"))
      SnapshotOps.commitAppend(spark, table, wave(50, 100),
        statsCols = Seq("id"))
      SnapshotOps.commitAppend(spark, table, wave(100, 150),
        statsCols = Seq("id"))
      // (1) subscribe from scratch, one version per micro-batch
      val run1 = SnapshotStream.drainCollect(spark, table,
        s"$scratch/ckpt1", maxVersionsPerBatch = 1)
      val run1Batches = run1.size.toLong
      val run1Rows = run1.map(_._2.size.toLong).sum
      // (2) MOR delete of consumed base rows → the caught-up
      // subscriber's next span must refuse, not double-read
      SnapshotOps.commitDelete(spark, table, col("id") <= 10L)
      val refused =
        try { SnapshotStream.drainCollect(spark, table, s"$scratch/ckpt1"); 0L }
        catch { case e: org.apache.spark.sql.streaming.StreamingQueryException
            if { def m(x: Throwable): Boolean = x != null &&
                (Option(x.getMessage).exists(_.contains("snapshotDiff")) ||
                  m(x.getCause))
              m(e) } => 1L }
      // (3) fresh subscriber: one batch = full visible content (DVs
      // applied); its rows feed the oracle-checked aggregate
      val run2 = SnapshotStream.drainCollect(spark, table,
        s"$scratch/ckpt2")
      import spark.implicits._
      val seen = run2.flatMap(_._2)
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .toDF("id", "bal", "seg")
      seen.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("seg"), col("n"), col("bal_total"),
          lit(run1Batches).as("run1_batches"),
          lit(run1Rows).as("run1_rows"),
          lit(refused).as("rewrite_refused"))
        .orderBy("seg")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH fin AS (
        |  SELECT c_mktsegment AS seg, c_acctbal AS bal
        |  FROM customer WHERE c_custkey > 10 AND c_custkey < 150)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(3 AS BIGINT) AS run1_batches,
        |  CAST(150 AS BIGINT) AS run1_rows,
        |  CAST(1 AS BIGINT) AS rewrite_refused
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
      headline = true),

    // CHANGE-FEED STREAM (r12) — mode=diff on the snapshot source:
    // every micro-batch IS snapshotDiff(from, to) (rows tagged
    // insert/delete), so the rewrite-class spans the append source
    // refuses (q262 contract 2) stream as row-level deltas instead
    // (Delta readChangeFeed). Gated properties: (1) one diff batch per
    // version under maxVersionsPerBatch=1 — n_batches pins it, and the
    // churn totals n_inserts/n_deletes pin each span's shape (append →
    // inserts only, MOR delete → 20 deletes, COW update → 10
    // delete+insert pairs — survivor rows of rewritten files cancel,
    // so the counts are layout-independent); (2) net-applying all
    // batches in order reconstructs the table's final visible content,
    // whose per-segment aggregate the oracle re-derives from customer.
    "q263_stream_change_feed" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      import graft.streaming.SnapshotStream
      val scratch = s"${runScopedDir("/tmp/graft_q263", sfDir)}/s-" +
        java.util.UUID.randomUUID().toString.take(8)
      val table = s"$scratch/table"
      val cust = spark.table("customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
      def wave(lo: Int, hi: Int) = // half-open: c_custkey starts at 0
        cust.where(col("id") >= lo && col("id") < hi)
      SnapshotOps.commitAppend(spark, table, wave(0, 100),
        statsCols = Seq("id"))
      SnapshotOps.commitAppend(spark, table, wave(100, 150),
        statsCols = Seq("id"))
      SnapshotOps.commitDelete(spark, table, col("id") < 20L)   // MOR
      SnapshotOps.commitRewrite(spark, table, col("id") >= 140L, // COW
        _.withColumn("bal", col("bal") + lit(1000.0)))
      val run = SnapshotStream.drainCollect(spark, table,
        s"$scratch/ckpt", maxVersionsPerBatch = 1, mode = "diff")
      val drained = run.flatMap(_._2)
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getString(3)))
      val nBatches = run.size.toLong
      val nInserts = drained.count(_._4 == "insert").toLong
      val nDeletes = drained.count(_._4 == "delete").toLong
      // net-apply the feed: surviving (net = +1) rows ARE the table
      import spark.implicits._
      val net = drained.groupBy(t => (t._1, t._2, t._3))
        .map { case (k, rs) =>
          k -> rs.map(t => if (t._4 == "insert") 1 else -1).sum }
        .collect { case ((id, bal, seg), n) if n > 0 => (id, bal, seg) }
        .toSeq.toDF("id", "bal", "seg")
      net.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("seg"), col("n"), col("bal_total"),
          lit(nBatches).as("n_batches"),
          lit(nInserts).as("n_inserts"),
          lit(nDeletes).as("n_deletes"))
        .orderBy("seg")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH fin AS (
        |  SELECT c_mktsegment AS seg,
        |    CASE WHEN c_custkey >= 140 THEN c_acctbal + 1000.0
        |         ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey >= 20 AND c_custkey < 150)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(4 AS BIGINT) AS n_batches,
        |  CAST(160 AS BIGINT) AS n_inserts,
        |  CAST(30 AS BIGINT) AS n_deletes
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
      headline = true),

    // TABLE_CHANGES AT THE SQL SURFACE (r12) — Delta's table_changes
    // exposed through the Engine: PRAGMA table_changes(t, from, to)
    // returns one row per net row-level change per version (version
    // v's rows = snapshotDiff(v-1, v) tagged _commit_version = v), so
    // a SQL user audits WHAT each committed DML changed without any
    // API surface. The lifecycle mixes commit shapes deliberately —
    // two appends, a MOR delete (deletion vectors, zero files
    // rewritten), a COW update (delete+insert pairs) — and the oracle
    // re-derives every span's churn from customer alone. Cost scales
    // with each span's CHANGED units (unit-raw cancellation), never
    // the table.
    "q264_sql_table_changes" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck(
        "CREATE TABLE g264_acct (id INTEGER, bal DOUBLE, seg VARCHAR)")
      e.executeDuck(
        """INSERT INTO g264_acct
          |SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
          |WHERE c_custkey < 120""".stripMargin)                    // v1
      e.executeDuck(
        """INSERT INTO g264_acct
          |SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
          |WHERE c_custkey >= 120 AND c_custkey < 150""".stripMargin) // v2
      e.executeDuck("SET delete_mode = 'mor'")
      try e.executeDuck("DELETE FROM g264_acct WHERE bal < 0")      // v3
      finally e.executeDuck("SET delete_mode = 'cow'")
      e.executeDuck(
        "UPDATE g264_acct SET bal = bal + 50 WHERE seg = 'MACHINERY'") // v4
      val feed = e.executeDuck("PRAGMA table_changes('g264_acct', 1, 4)")
        .localCheckpoint()
      // r13: every change row carries its commit's wall-clock stamp
      // (Delta CDF parity). Wall-clock can't be re-derived by the
      // oracle, so pin its invariants instead: one positive stamp per
      // version, nondecreasing with version.
      val ts = feed.select(col("_commit_version"), col("_commit_timestamp"))
        .distinct().orderBy("_commit_version")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val tsMono = ts.length == 4 && ts.forall(_._2 > 0) &&
        ts.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
      val out = feed
        .groupBy(col("_commit_version").as("commit_version"),
          col("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("*"),
          lit(if (tsMono) 1L else 0L).as("ts_monotone"))
        .orderBy("commit_version", "change_type")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH base AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer WHERE c_custkey < 150),
        |v4m AS (SELECT * FROM base
        |  WHERE bal >= 0 AND seg = 'MACHINERY'),
        |feed AS (
        |  SELECT 1 AS v, 'insert' AS change_type, bal
        |  FROM base WHERE id < 120
        |  UNION ALL SELECT 2, 'insert', bal FROM base WHERE id >= 120
        |  UNION ALL SELECT 3, 'delete', bal FROM base WHERE bal < 0
        |  UNION ALL SELECT 4, 'delete', bal FROM v4m
        |  UNION ALL SELECT 4, 'insert', bal + 50.0 FROM v4m)
        |SELECT CAST(v AS BIGINT) AS commit_version, change_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(1 AS BIGINT) AS ts_monotone
        |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      headline = true),

    // RESTORE AT THE SQL SURFACE (r13) — Delta RESTORE gated under the
    // driver oracle: a 3-DML lifecycle, PRAGMA restore_table back to
    // v1 (a pure-metadata NEW commit — zero data files written), a
    // post-restore DML building on the restored content, and the
    // restore span read back through the change feed. The oracle
    // re-derives everything from customer alone: (a) final visible
    // content = v1's rows with ONLY the post-restore update applied
    // (the restore wiped v2's update and v3's delete); (b) the restore
    // span's churn — inserts = rows the rollback resurrected
    // (v3-deleted ids) or un-updated (MACHINERY originals), deletes =
    // the updated MACHINERY forms it retracted; (c) history is
    // preserved: 5 auditable versions, restore included.
    "q265_sql_restore_table" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck(
        "CREATE TABLE g265_acct (id INTEGER, bal DOUBLE, seg VARCHAR)")
      e.executeDuck(
        """INSERT INTO g265_acct
          |SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
          |WHERE c_custkey < 120""".stripMargin)                     // v1
      e.executeDuck(
        "UPDATE g265_acct SET bal = bal + 50 WHERE seg = 'MACHINERY'") // v2
      e.executeDuck("DELETE FROM g265_acct WHERE id >= 100")          // v3
      e.executeDuck("PRAGMA restore_table('g265_acct', 1)")       // v4=v1
      e.executeDuck(
        "UPDATE g265_acct SET bal = bal - 25 WHERE seg = 'BUILDING'") // v5
      val feed = e.executeDuck("PRAGMA table_changes('g265_acct', 4, 4)")
        .localCheckpoint() // consumed twice below — diff runs once
      val restoreIns =
        feed.where(col("change_type") === lit("insert")).count()
      val restoreDel =
        feed.where(col("change_type") === lit("delete")).count()
      val nVersions =
        e.executeDuck("PRAGMA table_snapshots('g265_acct')").count()
      val out = e.executeDuck("SELECT seg, bal FROM g265_acct")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("seg"), col("n"), col("bal_total"),
          lit(restoreIns).as("restore_inserts"),
          lit(restoreDel).as("restore_deletes"),
          lit(nVersions).as("n_versions"))
        .orderBy("seg")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH base AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer WHERE c_custkey < 120),
        |fin AS (SELECT seg,
        |  CASE WHEN seg = 'BUILDING' THEN bal - 25.0 ELSE bal END AS bal
        |  FROM base)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST((SELECT count(*) FROM base
        |        WHERE seg = 'MACHINERY' OR id >= 100) AS BIGINT)
        |    AS restore_inserts,
        |  CAST((SELECT count(*) FROM base
        |        WHERE seg = 'MACHINERY' AND id < 100) AS BIGINT)
        |    AS restore_deletes,
        |  CAST(5 AS BIGINT) AS n_versions
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
      headline = true),

    // EQUALITY-DELETE LIFECYCLE (r13) — Iceberg v2's second delete
    // shape, gated under the driver oracle: DELETE BY KEY with zero
    // data files scanned at commit time (the commit writes only the
    // key list; readers anti-join it out of data units with a strictly
    // LOWER stamped _seq). The lifecycle exercises every ordering
    // property the oracle can see: (a) v3 deletes ids 10..19 from both
    // earlier appends; (b) v4 RE-INSERTS ids 10..14 (bal+500) — a
    // higher sequence, so the v3 delete must NOT swallow them; (c) v5
    // deletes by a DIFFERENT key (seg), applying to everything below
    // it including the re-inserts; (d) v6 mixes in a positional MOR
    // delete over the visible rows; (e) v7 compacts — both delete
    // debts bake in and the `=` lines drop. The oracle re-derives the
    // final content and the v3 time-travel count from customer alone.
    "q266_eq_delete_lifecycle" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val scratch = s"${runScopedDir("/tmp/graft_q266", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val table = s"$scratch/table"
      val cust = spark.table("customer")
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
      SnapshotOps.commitAppend(spark, table, cust.where(col("id") < 100),
        statsCols = Seq("id"), bloomCols = Seq("id"))            // v1
      SnapshotOps.commitAppend(spark, table,
        cust.where(col("id") >= 100 && col("id") < 150),
        statsCols = Seq("id"), bloomCols = Seq("id"))            // v2
      // keys derived FROM the table's own column: identical types, so
      // the anti-join needs no cast (the cross-engine hash rule)
      SnapshotOps.commitDeleteByKey(spark, table,
        cust.where(col("id") >= 10 && col("id") <= 19)
          .select(col("id")))                                    // v3
      val v3Visible = SnapshotOps.readSnapshot(spark, table, 3).count()
      SnapshotOps.commitAppend(spark, table,
        cust.where(col("id") >= 10 && col("id") <= 14)
          .withColumn("bal", col("bal") + lit(500.0)))           // v4
      SnapshotOps.commitDeleteByKey(spark, table,
        cust.select(col("seg"))
          .where(col("seg") === lit("AUTOMOBILE")).distinct())   // v5
      SnapshotOps.commitDelete(spark, table, col("bal") < 0)     // v6
      val (eqFilesBefore, eqKeys) = SnapshotOps.eqDeleteStats(table, 6)
      SnapshotOps.commitCompact(spark, table, 2)                 // v7
      val (eqFilesAfter, _) = SnapshotOps.eqDeleteStats(table, 7)
      SnapshotOps.readLatest(spark, table)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,2)")).cast("double")
            .as("bal_total"))
        .select(col("seg"), col("n"), col("bal_total"),
          lit(v3Visible).as("v3_visible"),
          lit(eqKeys).as("eq_keys"),
          lit(eqFilesBefore.toLong).as("eq_files_before"),
          lit(eqFilesAfter.toLong).as("eq_files_after"),
          lit(SnapshotOps.currentVersion(table).toLong).as("n_versions"))
        .orderBy("seg")
        // q194's intra-JVM rule: materialize before returning a frame
        // over run-scoped scratch
        .localCheckpoint()
    },
      """WITH base AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer WHERE c_custkey < 150),
        |v AS (
        |  SELECT id, bal, seg FROM base WHERE id NOT BETWEEN 10 AND 19
        |  UNION ALL
        |  SELECT id, bal + 500.0, seg FROM base
        |  WHERE id BETWEEN 10 AND 14),
        |fin AS (SELECT * FROM v
        |  WHERE seg <> 'AUTOMOBILE' AND bal >= 0)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST((SELECT count(*) FROM base
        |        WHERE id NOT BETWEEN 10 AND 19) AS BIGINT) AS v3_visible,
        |  CAST(11 AS BIGINT) AS eq_keys,
        |  CAST(2 AS BIGINT) AS eq_files_before,
        |  CAST(0 AS BIGINT) AS eq_files_after,
        |  CAST(7 AS BIGINT) AS n_versions
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,
      headline = true),

    // COLUMN EVOLUTION AT THE SQL SURFACE (r14) — RENAME/DROP COLUMN
    // as zero-rewrite column-mapping commits (Iceberg field-ids /
    // Delta column-mapping shape; SnapshotOps.commitRenameColumn/
    // commitDropColumn): physical names freeze into files at first
    // write, renames and drops are pure manifest metadata, readers
    // project live ids AS OF the version being read. The lifecycle:
    // create+fill (v1), RENAME bal→balance (v2), DROP seg (v3), an
    // evolved append under the NEW shape (v4), a COW UPDATE addressing
    // the RENAMED column (v5) — then the final content, plus time
    // travel to the pre-evolution (v1: id,bal,seg) and post-drop (v3:
    // id,balance) shapes, all re-derived by the oracle from customer
    // alone. meta_only pins the design point: both evolution commits
    // wrote ZERO data files.
    "q268_sql_column_evolution" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val e = new Engine(spark)
      e.executeDuck(
        "CREATE TABLE g268_acct (id INTEGER, bal DOUBLE, seg VARCHAR)")
      e.executeDuck(
        """INSERT INTO g268_acct
          |SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
          |WHERE c_custkey < 100""".stripMargin)                  // v1
      e.executeDuck("ALTER TABLE g268_acct RENAME COLUMN bal TO balance")
      val renameMetaOnly = e.lastCommit("g268_acct").written == 0 // v2
      e.executeDuck("ALTER TABLE g268_acct DROP COLUMN seg")
      val dropMetaOnly = e.lastCommit("g268_acct").written == 0   // v3
      e.executeDuck(
        """INSERT INTO g268_acct
          |SELECT c_custkey, c_acctbal + 1 FROM customer
          |WHERE c_custkey >= 100 AND c_custkey < 140""".stripMargin) // v4
      e.executeDuck(
        "UPDATE g268_acct SET balance = balance + 50 WHERE id < 20") // v5
      val dir = e.snapshotDir("g268_acct").get
      def phaseRow(phase: String, df: org.apache.spark.sql.DataFrame,
          balCol: String) =
        df.agg(count(lit(1)).as("n"),
            sum(col(balCol).cast("decimal(18,2)")).cast("double")
              .as("bal_total"))
          .select(lit(phase).as("phase"), col("n"), col("bal_total"),
            lit(df.columns.mkString(",")).as("cols"))
      val out = phaseRow("final", e.table("g268_acct"), "balance")
        .unionByName(phaseRow("asof_v1",
          SnapshotOps.readSnapshot(spark, dir, 1), "bal"))
        .unionByName(phaseRow("asof_v3",
          SnapshotOps.readSnapshot(spark, dir, 3), "balance"))
        .select(col("*"),
          lit(if (renameMetaOnly && dropMetaOnly) 1L else 0L)
            .as("meta_only"))
        .orderBy("phase")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH base AS (SELECT c_custkey AS id, c_acctbal AS bal
        |    FROM customer WHERE c_custkey < 100),
        |fin AS (
        |  SELECT id,
        |    CASE WHEN id < 20 THEN bal + 50 ELSE bal END AS balance
        |  FROM base
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 1 FROM customer
        |  WHERE c_custkey >= 100 AND c_custkey < 140),
        |r AS (
        |  SELECT 'final' AS phase, count(*) AS n,
        |    CAST(sum(CAST(balance AS DECIMAL(18,2))) AS DOUBLE)
        |      AS bal_total,
        |    'id,balance' AS cols FROM fin
        |  UNION ALL
        |  SELECT 'asof_v1', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE),
        |    'id,bal,seg' FROM base
        |  UNION ALL
        |  SELECT 'asof_v3', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE),
        |    'id,balance' FROM base)
        |SELECT phase, CAST(n AS BIGINT) AS n, bal_total, cols,
        |  CAST(1 AS BIGINT) AS meta_only
        |FROM r ORDER BY phase""".stripMargin,
      headline = true),

    // STRING data skipping (r14): manifest min/max bounds over a
    // STRING key — stored through the order-preserving 12-byte
    // truncation encoding (SnapshotOps.encodeBound, Iceberg's
    // truncate(L) bound semantics) — so range AND prefix (LIKE 'x%')
    // predicates on sorted string keys (URLs, ISO-date strings,
    // id-prefixed names) prune the FILE LIST from metadata alone,
    // the way numeric keys already did in q238. Blooms can't serve
    // either shape (no order). Truncation collisions only ADMIT
    // extra files — the typed residual filter keeps results exact —
    // and the oracle pins every probe's content plus that pruning
    // really happened (`pruned` = kept < total files).
    "q269_string_stats_skipping" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q269", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("lineitem").where(col("l_orderkey") <= 4000)
        .select(concat(col("l_returnflag"), lit("-"),
          lpad(col("l_orderkey").cast("string"), 8, "0")).as("skey"),
          col("l_quantity"))
      SnapshotOps.commitAppend(spark, table,
        base.repartitionByRange(8, col("skey")),
        statsCols = Seq("skey"))
      val v = SnapshotOps.currentVersion(table)
      val total = SnapshotOps.snapshotEntries(table, v).size
      def probeRow(probe: String, df: org.apache.spark.sql.DataFrame,
          kept: Int) =
        df.agg(count(col("skey")).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("qty"))
          .select(lit(probe).as("probe"), col("n"), col("qty"),
            lit(kept < total).as("pruned"))
      val ranges = Seq(
        ("a_mid", "A-00000500", "A-00001500"),
        ("cross_flag", "N-00003000", "R-00000100")).map {
        case (probe, lo, hi) =>
          val kept = SnapshotOps.rangeFiles(table, v, "skey",
            SnapshotOps.encodeBound(lo), SnapshotOps.encodeBound(hi)).size
          probeRow(probe,
            SnapshotOps.readSnapshotRangeOf(spark, table, v, "skey", lo, hi),
            kept)
      }
      val prefKept = SnapshotOps.rangeFiles(table, v, "skey",
        SnapshotOps.encodeBound("R-"),
        SnapshotOps.prefixUpperBound("R-")).size
      val prefix = probeRow("prefix_r",
        SnapshotOps.readSnapshotPrefix(spark, table, v, "skey", "R-"),
        prefKept)
      (ranges :+ prefix).reduce(_.unionByName(_)).orderBy("probe")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH b AS (SELECT l_returnflag || '-' ||
        |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS skey,
        |    l_quantity
        |  FROM lineitem WHERE l_orderkey <= 4000),
        |r(probe, lo, hi) AS (VALUES
        |  ('a_mid', 'A-00000500', 'A-00001500'),
        |  ('cross_flag', 'N-00003000', 'R-00000100')),
        |ranges AS (
        |  SELECT probe, count(skey) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS qty, TRUE AS pruned
        |  FROM r LEFT JOIN b ON skey BETWEEN lo AND hi
        |  GROUP BY probe),
        |pref AS (
        |  SELECT 'prefix_r' AS probe, count(skey) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS qty, TRUE AS pruned
        |  FROM b WHERE skey LIKE 'R-%')
        |SELECT * FROM ranges UNION ALL SELECT * FROM pref
        |ORDER BY probe""".stripMargin,
      headline = true),

    // TIMESTAMP data skipping (r14): manifest bounds over a
    // timestamp key (epoch-micros encoding — exact integers, total-
    // ordered), making time-window reads over an event log prune to
    // the covering files before Spark lists anything — THE canonical
    // 100 TB skip: time-range queries over append-mostly logs whose
    // files are naturally time-clustered. Probe values are
    // java.time.Instant on the Spark side and naive TIMESTAMP
    // literals in DuckDB — identical under the UTC session tz both
    // engines run with.
    "q270_time_stats_skipping" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val table = s"${runScopedDir("/tmp/graft_q270", sfDir)}/t-" +
        java.util.UUID.randomUUID().toString.take(8)
      val base = spark.table("events")
        .select(col("ts"), col("event_type"), col("value"))
      SnapshotOps.commitAppend(spark, table,
        base.repartitionByRange(8, col("ts")),
        statsCols = Seq("ts"))
      val v = SnapshotOps.currentVersion(table)
      val total = SnapshotOps.snapshotEntries(table, v).size
      Seq(
        ("jan_05_10", "2024-01-05T00:00:00Z", "2024-01-10T00:00:00Z"),
        ("jan_20_21", "2024-01-20T00:00:00Z", "2024-01-21T00:00:00Z"))
        .map { case (probe, loS, hiS) =>
          val (lo, hi) =
            (java.time.Instant.parse(loS), java.time.Instant.parse(hiS))
          val kept = SnapshotOps.rangeFiles(table, v, "ts",
            SnapshotOps.encodeBound(lo), SnapshotOps.encodeBound(hi)).size
          SnapshotOps.readSnapshotRangeOf(spark, table, v, "ts", lo, hi)
            .agg(count(col("ts")).as("n"),
              sum(col("value").cast("decimal(18,4)"))
                .cast("double").as("val_total"),
              countDistinct(col("event_type")).as("types"))
            .select(lit(probe).as("probe"), col("n"), col("val_total"),
              col("types"), lit(kept < total).as("pruned"))
        }.reduce(_.unionByName(_)).orderBy("probe")
        // materialized before return: q194's intra-JVM safety rule
        .localCheckpoint()
    },
      """WITH r(probe, lo, hi) AS (VALUES
        |  ('jan_05_10', TIMESTAMP '2024-01-05 00:00:00',
        |    TIMESTAMP '2024-01-10 00:00:00'),
        |  ('jan_20_21', TIMESTAMP '2024-01-20 00:00:00',
        |    TIMESTAMP '2024-01-21 00:00:00'))
        |SELECT probe, count(ts) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS val_total,
        |  count(DISTINCT event_type) AS types, TRUE AS pruned
        |FROM r LEFT JOIN events e ON e.ts BETWEEN lo AND hi
        |GROUP BY probe ORDER BY probe""".stripMargin,
      headline = true),

    // SQL-surface manifest pruning (r14): with `SET auto_stats = true`
    // every Engine commit records typed min/max bounds for all
    // bounds-encodable columns, and a PLAIN SELECT's WHERE — no API,
    // no hints — translates to manifest constraints that prune the
    // file list before Spark lists anything (ScanPrune conjunct
    // extraction over the token stream + SnapshotOps.predFiles). The
    // Iceberg/Delta engine-scan contract at the SQL surface: banded
    // ingest (per-flag, per-year commits) gives narrow per-file
    // bounds, so string BETWEEN, LIKE-prefix and time-window queries
    // open the covering files only. `pruned` comes from the Engine's
    // recorded decision (lastPrune: kept < total) — the oracle pins
    // every query's content AND that skipping really happened.
    "q271_sql_pruned_scan" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("SET auto_stats = true")
      // staging base, materialized ONCE: the six banded inserts below
      // must not re-scan lineitem each (6 full scans goes superlinear
      // at sf1 — measured 31.9 s; one scan + six 24k-row reads doesn't)
      val base = spark.table("lineitem")
        .where(col("l_orderkey") <= 4000)
        .select(col("l_returnflag").as("flag"),
          concat(col("l_returnflag"), lit("-"),
            lpad(col("l_orderkey").cast("string"), 8, "0")).as("skey"),
          col("l_shipdate").as("ship"), col("l_quantity").as("qty"))
        .localCheckpoint()
      e.register("g271_base", base)
      e.executeDuck("CREATE TABLE g271_s (skey VARCHAR, qty DOUBLE)")
      Seq("A", "N", "R").foreach { flag =>
        e.executeDuck(
          s"""INSERT INTO g271_s SELECT skey, qty FROM g271_base
             |WHERE flag = '$flag'""".stripMargin)
      }
      e.executeDuck("CREATE TABLE g271_t (ship TIMESTAMP, qty DOUBLE)")
      Seq("year(ship) < 1997", "year(ship) = 1997",
        "year(ship) >= 1998").foreach { band =>
        e.executeDuck(
          s"""INSERT INTO g271_t
             |SELECT ship, qty FROM g271_base WHERE $band""".stripMargin)
      }
      def run(probe: String, table: String, sql: String) = {
        val df = e.executeDuck(sql)
        val (kept, total) = e.lastPrune.getOrElse(table, (0, 0))
        df.select(lit(probe).as("probe"), col("n"), col("qty"),
          lit(kept < total).as("pruned"))
      }
      val out = Seq(
        run("between_n", "g271_s",
          """SELECT count(skey) AS n,
            |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
            |FROM g271_s
            |WHERE skey BETWEEN 'N-00000500' AND 'N-00002500'"""
            .stripMargin),
        run("prefix_r", "g271_s",
          """SELECT count(skey) AS n,
            |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
            |FROM g271_s WHERE skey LIKE 'R-%'""".stripMargin),
        run("ts_1997", "g271_t",
          """SELECT count(ship) AS n,
            |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
            |FROM g271_t
            |WHERE ship >= TIMESTAMP '1997-01-01 00:00:00'
            |  AND ship < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin))
        .reduce(_.unionByName(_)).orderBy("probe")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally {
        graft.operators.SnapshotOps.releaseCheckpoint(base)
        e.close()
      }
    },
      """WITH b AS (SELECT l_returnflag || '-' ||
        |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS skey,
        |    l_shipdate AS ship, l_quantity AS qty
        |  FROM lineitem WHERE l_orderkey <= 4000)
        |SELECT 'between_n' AS probe, count(skey) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned
        |FROM b WHERE skey BETWEEN 'N-00000500' AND 'N-00002500'
        |UNION ALL
        |SELECT 'prefix_r', count(skey),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE skey LIKE 'R-%'
        |UNION ALL
        |SELECT 'ts_1997', count(ship),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE ship >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND ship < TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY probe""".stripMargin,
      headline = true),

    // SQL TIME TRAVEL (r14): `t VERSION AS OF n` / `t TIMESTAMP AS OF
    // 'ts'` at the SQL surface — the Delta/Iceberg idiom over the
    // snapshot layer's committed versions, resolved per table
    // REFERENCE (a self-join of two versions of the same table is one
    // query), with timestamps resolving to the latest commit at-or-
    // before the instant. Versions: v1 insert, v2 insert, v3 UPDATE —
    // so as-of reads must reproduce both pre-append and pre-update
    // content, and the oracle re-derives each phase from the base
    // table. The 15 ms sleeps separate commit wall-clock stamps so
    // the TIMESTAMP AS OF phase is deterministic.
    "q272_sql_time_travel" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g272 (id INTEGER, val DOUBLE)")
      e.executeDuck(
        """INSERT INTO g272 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 500""".stripMargin)              // v1
      Thread.sleep(15)
      e.executeDuck(
        """INSERT INTO g272 SELECT c_custkey + 10000, c_acctbal
          |FROM customer WHERE c_custkey <= 300""".stripMargin) // v2
      Thread.sleep(15)
      e.executeDuck("UPDATE g272 SET val = val + 100 WHERE id <= 200") // v3
      val dir = e.snapshotDir("g272").get
      val v1ts = new java.sql.Timestamp(
        SnapshotOps.snapshotTimestamp(dir, 1).get).toInstant
        .atZone(java.time.ZoneId.of("UTC")).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      def phase(name: String, sql: String) =
        e.executeDuck(sql).select(lit(name).as("phase"), col("n"),
          col("total"))
      val agg = "count(*) AS n, CAST(sum(CAST(val AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS total"
      val out = Seq(
        phase("now", s"SELECT $agg FROM g272"),
        phase("v2", s"SELECT $agg FROM g272 VERSION AS OF 2"),
        phase("v1", s"SELECT $agg FROM g272 FOR VERSION AS OF 1"),
        phase("ts_v1", s"SELECT $agg FROM g272 TIMESTAMP AS OF '$v1ts'"),
        phase("self_join",
          """SELECT count(*) AS n, CAST(NULL AS DOUBLE) AS total
            |FROM g272 VERSION AS OF 1 a JOIN g272 b ON a.id = b.id
            |""".stripMargin))
        .reduce(_.unionByName(_)).orderBy("phase")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH v1 AS (SELECT c_custkey AS id, c_acctbal AS val
        |    FROM customer WHERE c_custkey <= 500),
        |v2 AS (SELECT * FROM v1 UNION ALL
        |  SELECT c_custkey + 10000, c_acctbal FROM customer
        |  WHERE c_custkey <= 300),
        |v3 AS (SELECT id,
        |    CASE WHEN id <= 200 THEN val + 100 ELSE val END AS val
        |  FROM v2),
        |r AS (
        |  SELECT 'now' AS phase, count(*) AS n,
        |    CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM v3
        |  UNION ALL SELECT 'v2', count(*),
        |    CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) FROM v2
        |  UNION ALL SELECT 'v1', count(*),
        |    CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) FROM v1
        |  UNION ALL SELECT 'ts_v1', count(*),
        |    CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) FROM v1
        |  UNION ALL SELECT 'self_join',
        |    (SELECT count(*) FROM v1 a JOIN v3 b ON a.id = b.id),
        |    CAST(NULL AS DOUBLE))
        |SELECT phase, CAST(n AS BIGINT) AS n, total FROM r
        |ORDER BY phase""".stripMargin,
      headline = true),

    // SQL-declared WRITE LAYOUT (r14): `ALTER TABLE t WRITE ORDERED BY
    // cols [INTO n FILES]` — the Iceberg sort-order table property at
    // the SQL surface. Every subsequent INSERT range-partitions and
    // sorts on the declared keys, so commits land as key-banded files
    // with tight bounds, and the sort keys' stats are recorded on
    // every commit (declaring a layout IS declaring skipping intent —
    // no auto_stats required). The probes arrive through PLAIN SQL
    // from an UNSORTED source: layout, not ingest order, is what
    // makes them prune. Closes the SQL-only loop: declare layout →
    // ingest → skippable scans, zero API calls.
    "q273_sql_write_layout" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g273 (skey STRING, qty DOUBLE)")
      e.executeDuck("ALTER TABLE g273 WRITE ORDERED BY skey INTO 8 FILES")
      // ONE insert of the whole (unsorted) source — banding must come
      // from the declared layout alone
      e.executeDuck(
        """INSERT INTO g273
          |SELECT l_returnflag || '-' ||
          |    lpad(CAST(l_orderkey AS STRING), 8, '0'), l_quantity
          |FROM lineitem WHERE l_orderkey <= 4000""".stripMargin)
      def run(probe: String, where: String) = {
        val df = e.executeDuck(
          s"""SELECT count(skey) AS n,
             |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM g273 WHERE $where""".stripMargin)
        val (kept, total) = e.lastPrune.getOrElse("g273", (0, 0))
        df.select(lit(probe).as("probe"), col("n"), col("qty"),
          lit(kept < total).as("pruned"))
      }
      val out = Seq(
        run("band_n", "skey BETWEEN 'N-00000500' AND 'N-00002500'"),
        run("prefix_a", "skey LIKE 'A-%'"),
        run("point_r", "skey = 'R-00000003'"))
        .reduce(_.unionByName(_)).orderBy("probe")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH b AS (SELECT l_returnflag || '-' ||
        |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS skey,
        |    l_quantity AS qty
        |  FROM lineitem WHERE l_orderkey <= 4000)
        |SELECT 'band_n' AS probe, count(skey) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned
        |FROM b WHERE skey BETWEEN 'N-00000500' AND 'N-00002500'
        |UNION ALL
        |SELECT 'point_r', count(skey),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE skey = 'R-00000003'
        |UNION ALL
        |SELECT 'prefix_a', count(skey),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE skey LIKE 'A-%'
        |ORDER BY probe""".stripMargin,
      headline = true),

    // Metadata-only COUNT(*) at the SQL surface (r14): Iceberg's
    // count pushdown — `SELECT count(*) FROM t` answers from summed
    // manifest row stats with ZERO data files opened (footer-recorded
    // row counts make this exact from commit one), MoR deletes
    // subtract their DV position counts so the metadata answer stays
    // exact through merge-on-read deletes, and the shortcut DECLINES
    // (ordinary scan) the moment exactness is unprovable. `meta` pins
    // that the metadata path really answered.
    "q274_sql_meta_count" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g274 (id INTEGER, flag STRING)")
      e.executeDuck(
        """INSERT INTO g274 SELECT c_custkey, c_mktsegment
          |FROM customer WHERE c_custkey <= 600""".stripMargin)
      def count(phase: String) = {
        val df = e.executeDuck("SELECT count(*) AS n FROM g274")
        val meta = e.lastMetaCount.contains("g274")
        e.lastMetaCount.clear()
        df.select(lit(phase).as("phase"), col("n"),
          lit(meta).as("meta"))
      }
      val afterInsert = count("after_insert")
      e.executeDuck("SET delete_mode = 'mor'")
      e.executeDuck("DELETE FROM g274 WHERE id <= 100")
      val afterDelete = count("after_mor_delete")
      val out = afterInsert.unionByName(afterDelete).orderBy("phase")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally e.close()
    },
      """WITH b AS (SELECT c_custkey AS id FROM customer
        |  WHERE c_custkey <= 600)
        |SELECT 'after_insert' AS phase, count(*) AS n, TRUE AS meta
        |FROM b
        |UNION ALL
        |SELECT 'after_mor_delete', count(*), TRUE FROM b WHERE id > 100
        |ORDER BY phase""".stripMargin,
      headline = true),

    // SAME-COLUMN OR PRUNING (r15): a depth-0 OR region ALL of whose
    // branches constrain ONE column prunes with the interval UNION —
    // per-column CNF alternatives through SnapshotOps.predFilesCnf,
    // so `BETWEEN a AND b OR BETWEEN c AND d` (and the IN dual as
    // exact point alternatives) skip untouched middle bands. Any
    // mixed-column or mixed-AND OR still extracts nothing (the
    // monotonicity kill, regression-pinned). Iceberg expression
    // binding does the structural analogue (Expressions.or over
    // bound range predicates); here it lands at the SQL surface with
    // zero user API. Observable: lastPrune per probe.
    "q275_sql_or_pruning" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("SET auto_stats = true")
      val base = spark.table("lineitem")
        .where(col("l_orderkey") <= 4000)
        .select(col("l_returnflag").as("flag"),
          concat(col("l_returnflag"), lit("-"),
            lpad(col("l_orderkey").cast("string"), 8, "0")).as("skey"),
          col("l_shipdate").as("ship"), col("l_quantity").as("qty"))
        .localCheckpoint()
      e.register("g275_base", base)
      e.executeDuck("CREATE TABLE g275_s (skey VARCHAR, qty DOUBLE)")
      Seq("A", "N", "R").foreach { flag =>
        e.executeDuck(
          s"""INSERT INTO g275_s SELECT skey, qty FROM g275_base
             |WHERE flag = '$flag'""".stripMargin)
      }
      e.executeDuck("CREATE TABLE g275_t (ship TIMESTAMP, qty DOUBLE)")
      Seq("year(ship) < 1997", "year(ship) = 1997",
        "year(ship) >= 1998").foreach { band =>
        e.executeDuck(
          s"""INSERT INTO g275_t
             |SELECT ship, qty FROM g275_base WHERE $band""".stripMargin)
      }
      def run(probe: String, table: String, where: String) = {
        e.lastPrune.clear()
        val df = e.executeDuck(
          s"""SELECT count(qty) AS n,
             |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM $table WHERE $where""".stripMargin)
        val (kept, total) = e.lastPrune.getOrElse(table, (0, 0))
        df.select(lit(probe).as("probe"), col("n"), col("qty"),
          lit(kept < total).as("pruned"))
      }
      val out = Seq(
        run("or_between_s", "g275_s",
          "skey BETWEEN 'A-00000100' AND 'A-00001000' OR " +
            "skey BETWEEN 'R-00000100' AND 'R-00001000'"),
        run("or_between_ts", "g275_t",
          "ship BETWEEN TIMESTAMP '1995-01-01 00:00:00' " +
            "AND TIMESTAMP '1995-12-31 23:59:59' OR " +
            "ship BETWEEN TIMESTAMP '1998-01-01 00:00:00' " +
            "AND TIMESTAMP '1998-12-31 23:59:59'"),
        run("in_points", "g275_s",
          "skey IN ('A-00000007', 'R-00000007')"),
        // mixed columns: must NOT translate — pruned stays false
        run("mixed_guard", "g275_s", "skey LIKE 'A-%' OR qty = 1"))
        .reduce(_.unionByName(_)).orderBy("probe")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally {
        graft.operators.SnapshotOps.releaseCheckpoint(base)
        e.close()
      }
    },
      """WITH b AS (SELECT l_returnflag || '-' ||
        |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS skey,
        |    l_shipdate AS ship, l_quantity AS qty
        |  FROM lineitem WHERE l_orderkey <= 4000)
        |SELECT 'in_points' AS probe, count(qty) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned
        |FROM b WHERE skey IN ('A-00000007', 'R-00000007')
        |UNION ALL
        |SELECT 'mixed_guard', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), FALSE
        |FROM b WHERE skey LIKE 'A-%' OR qty = 1
        |UNION ALL
        |SELECT 'or_between_s', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE skey BETWEEN 'A-00000100' AND 'A-00001000'
        |  OR skey BETWEEN 'R-00000100' AND 'R-00001000'
        |UNION ALL
        |SELECT 'or_between_ts', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE ship BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |    AND TIMESTAMP '1995-12-31 23:59:59'
        |  OR ship BETWEEN TIMESTAMP '1998-01-01 00:00:00'
        |    AND TIMESTAMP '1998-12-31 23:59:59'
        |ORDER BY probe""".stripMargin,
      headline = true),

    // HIDDEN PARTITIONING (r15): Iceberg's signature table-format
    // feature at the SQL surface — `CREATE TABLE … PARTITIONED BY
    // (days(ts), bucket(8, k))` records a partition spec in the
    // snapshot metadata; INSERTs hive-split by the DERIVED transform
    // values (one file = one partition tuple, transform columns never
    // stored) and stamp per-file derived bounds in the manifest; a
    // SELECT's WHERE prunes on them STRUCTURALLY — a day range opens
    // one day's files, an equality probe opens one bucket — with NO
    // column stats (auto_stats off throughout). Spec evolution via
    // `ALTER TABLE … SET PARTITION SPEC` governs new files only;
    // files predating a transform are never skipped by it. Oracle
    // recomputes every aggregate; `pruned` asserts the manifest
    // consultation actually skipped files.
    "q276_hidden_partitioning" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      val base = spark.table("lineitem")
        .where(col("l_orderkey") <= 2000)
        .select(
          to_timestamp(concat(lit("2024-03-0"),
            ((col("l_orderkey") % 3) + 1).cast("string"))).as("ship"),
          col("l_orderkey").cast("int").as("okey"),
          col("l_quantity").cast("double").as("qty"))
        .localCheckpoint()
      e.register("g276_base", base)
      e.executeDuck("CREATE TABLE g276 (ship TIMESTAMP, okey INTEGER, " +
        "qty DOUBLE) PARTITIONED BY (days(ship), bucket(8, okey))")
      e.executeDuck("INSERT INTO g276 SELECT ship, okey, qty FROM g276_base")
      def run(probe: String, where: String) = {
        e.lastPrune.clear()
        val df = e.executeDuck(
          s"""SELECT count(qty) AS n,
             |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM g276 WHERE $where""".stripMargin)
        val (kept, total) = e.lastPrune.getOrElse("g276", (0, 0))
        df.select(lit(probe).as("probe"), col("n"), col("qty"),
          lit(kept < total).as("pruned"))
      }
      val preEvo = Seq(
        run("day_range", "ship >= TIMESTAMP '2024-03-02 00:00:00' " +
          "AND ship < TIMESTAMP '2024-03-03 00:00:00'"),
        run("bucket_point", "okey = 1"))
      // evolution: days only; the appended row carries no bucket key,
      // so the point probe must keep it (absence never skips)
      e.executeDuck("ALTER TABLE g276 SET PARTITION SPEC (days(ship))")
      e.executeDuck("INSERT INTO g276 VALUES " +
        "(TIMESTAMP '2024-03-04 09:00:00', 1, 1.0)")
      val postEvo = Seq(
        run("evo_bucket_point", "okey = 1"),
        run("evo_new_day", "ship >= TIMESTAMP '2024-03-04 00:00:00'"))
      val out = (preEvo ++ postEvo).reduce(_.unionByName(_))
        .orderBy("probe")
        // q194's intra-JVM rule: materialize before returning a frame
        // over engine-scoped scratch
        .localCheckpoint()
      try out finally {
        graft.operators.SnapshotOps.releaseCheckpoint(base)
        e.close()
      }
    },
      """WITH b AS (SELECT
        |    CAST('2024-03-0' || CAST((l_orderkey % 3) + 1 AS VARCHAR)
        |      AS TIMESTAMP) AS ship,
        |    CAST(l_orderkey AS INTEGER) AS okey,
        |    CAST(l_quantity AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_orderkey <= 2000),
        |b2 AS (SELECT * FROM b UNION ALL
        |  SELECT TIMESTAMP '2024-03-04 09:00:00', 1, 1.0)
        |SELECT 'bucket_point' AS probe, count(qty) AS n,
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned
        |FROM b WHERE okey = 1
        |UNION ALL
        |SELECT 'day_range', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b WHERE ship >= TIMESTAMP '2024-03-02 00:00:00'
        |  AND ship < TIMESTAMP '2024-03-03 00:00:00'
        |UNION ALL
        |SELECT 'evo_bucket_point', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b2 WHERE okey = 1
        |UNION ALL
        |SELECT 'evo_new_day', count(qty),
        |  CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
        |FROM b2 WHERE ship >= TIMESTAMP '2024-03-04 00:00:00'
        |ORDER BY probe""".stripMargin,
      headline = true),

    // WAREHOUSE PERSISTENCE + TIME-BASED RETENTION (r15): `SET
    // warehouse = dir` makes CREATE TABLE land durably at
    // <dir>/<name>; close() leaves it and a NEW Engine re-attaches by
    // listing the warehouse — content, history and time travel
    // survive the session boundary, and commits continue on the same
    // chain. The lifecycle then closes with the timestamp-horizon
    // retention form (`expire_snapshots(t, older_than => TIMESTAMP
    // …)`, the Iceberg/Delta idiom): versions committed before the
    // horizon expire on the SAME `_ts` clock TIMESTAMP AS OF resolves
    // against, and as-of reads past the horizon fail loudly.
    "q277_warehouse_lifecycle" -> api((spark, sfDir) => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft_q277_wh").toString
      val e1 = new Engine(spark)
      e1.executeDuck(s"SET warehouse = '$wh'")
      e1.executeDuck(
        "CREATE TABLE g277 (id INTEGER, bal DOUBLE, seg VARCHAR)")
      e1.executeDuck(
        """INSERT INTO g277 SELECT c_custkey, c_acctbal, c_mktsegment
          |FROM customer WHERE c_custkey % 3 <> 0""".stripMargin) // v1
      e1.executeDuck(
        "UPDATE g277 SET bal = bal + 100 WHERE seg = 'BUILDING'") // v2
      e1.close()
      // a FRESH engine: nothing bound until the warehouse attaches
      val e2 = new Engine(spark)
      e2.executeDuck(s"SET warehouse = '$wh'")
      val nV1 = e2.executeDuck(
        "SELECT count(*) AS n FROM g277 VERSION AS OF 1")
        .collect()(0).getLong(0)
      Thread.sleep(60)
      val mid = java.time.LocalDateTime.now().format(
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      Thread.sleep(60)
      e2.executeDuck(
        """INSERT INTO g277 SELECT c_custkey, c_acctbal, c_mktsegment
          |FROM customer WHERE c_custkey % 3 = 0""".stripMargin)  // v3
      val versions = e2.snapshotDir("g277")
        .map(graft.operators.SnapshotOps.currentVersion).getOrElse(0)
      val expired = e2.executeDuck(
        s"PRAGMA expire_snapshots('g277', older_than => TIMESTAMP '$mid')")
        .collect()(0).getLong(0)
      val retained = e2.executeDuck("PRAGMA table_snapshots('g277')")
        .count()
      val asofFails = scala.util.Try(e2.executeDuck(
        "SELECT count(*) AS n FROM g277 VERSION AS OF 1").collect())
        .isFailure
      val out = e2.executeDuck(
        """SELECT count(*) AS n,
          |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total
          |FROM g277""".stripMargin)
        .select(lit("lifecycle").as("probe"), col("n"), col("bal_total"),
          lit(nV1).as("n_v1"), lit(versions).cast("long").as("versions"),
          lit(expired).as("expired"),
          lit(retained).as("retained"), lit(asofFails).as("asof_fails"))
        // q194's intra-JVM rule: materialize before reclaiming the
        // warehouse the frame reads from
        .localCheckpoint()
      e2.executeDuck("DROP TABLE g277") // destructive on durable tables
      try out finally {
        e2.close()
        new java.io.File(wh).delete()
      }
    },
      """WITH v1 AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    c_mktsegment AS seg FROM customer WHERE c_custkey % 3 <> 0),
        |v2 AS (SELECT id, CASE WHEN seg = 'BUILDING' THEN bal + 100
        |    ELSE bal END AS bal, seg FROM v1),
        |v3 AS (SELECT * FROM v2 UNION ALL
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |  WHERE c_custkey % 3 = 0)
        |SELECT 'lifecycle' AS probe, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  (SELECT count(*) FROM v1) AS n_v1,
        |  CAST(3 AS BIGINT) AS versions,
        |  CAST(2 AS BIGINT) AS expired,
        |  CAST(1 AS BIGINT) AS retained,
        |  TRUE AS asof_fails
        |FROM v3""".stripMargin,
      headline = true),

    // NAMED TAGS (r15): immutable refs that pin a version against
    // retention — the Iceberg tag model at the PRAGMA surface. The
    // probe tags v1, commits two more versions, then expires to a
    // 1-version horizon: the tagged v1 must stay readable through
    // `VERSION AS OF 'name'` while the untagged v2 is gone, and
    // dropping the tag releases the pin (asserted via table_refs).
    // 100 TB story: a tag is one 2-byte ref file; what it buys is
    // governance (audit/repro pins) with ZERO interference in the
    // retention sweep's O(live files) cost.
    "q278_sql_table_tags" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g278 (id INTEGER, bal DOUBLE)")
      e.executeDuck(
        """INSERT INTO g278 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 400""".stripMargin)                // v1
      e.executeDuck("PRAGMA create_tag('g278', 'baseline')")
      e.executeDuck("UPDATE g278 SET bal = bal + 50 WHERE id <= 100") // v2
      e.executeDuck(
        """INSERT INTO g278 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey > 400 AND c_custkey <= 500""".stripMargin) // v3
      e.executeDuck("PRAGMA expire_snapshots('g278', 1)")
      val refsN = e.executeDuck("PRAGMA table_refs('g278')").count()
      val v2Gone = scala.util.Try(e.executeDuck(
        "SELECT count(*) AS n FROM g278 VERSION AS OF 2").collect())
        .isFailure
      val agg = "count(*) AS n, CAST(sum(CAST(bal AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS total"
      def phase(name: String, sql: String) =
        e.executeDuck(sql).select(lit(name).as("phase"), col("n"),
          col("total"))
      val out = Seq(
        phase("now", s"SELECT $agg FROM g278"),
        phase("tagged", s"SELECT $agg FROM g278 VERSION AS OF 'baseline'"))
        .reduce(_.unionByName(_))
        .withColumn("refs", lit(refsN))
        .withColumn("v2_gone", lit(v2Gone))
        .orderBy("phase").localCheckpoint()
      try out finally e.close()
    },
      """WITH v1 AS (SELECT c_custkey AS id, c_acctbal AS bal
        |    FROM customer WHERE c_custkey <= 400),
        |v3 AS (SELECT id, CASE WHEN id <= 100 THEN bal + 50 ELSE bal
        |    END AS bal FROM v1
        |  UNION ALL SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_custkey > 400 AND c_custkey <= 500)
        |SELECT 'now' AS phase, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(1 AS BIGINT) AS refs, TRUE AS v2_gone FROM v3
        |UNION ALL
        |SELECT 'tagged', count(*),
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE),
        |  CAST(1 AS BIGINT), TRUE FROM v1
        |ORDER BY phase""".stripMargin,
      headline = true),

    // BRANCH FORKS (r15): `PRAGMA create_branch` forks the version
    // chain as the writable table `t.branch_<name>`; every DML verb
    // runs against it through the normal SQL path, fully isolated
    // from main; `VERSION AS OF '<name>'` reads its head from the
    // main name; `PRAGMA fast_forward` adopts the branch commits
    // (same version numbers — adopted history time-travels) and
    // consumes the fork. The fork is pure metadata (parent files
    // referenced in place) and the adoption is rename-only — zero
    // data bytes copied at any step, which is the property that
    // makes isolated multi-commit work affordable on a 100 TB table.
    "q279_sql_branch_fork" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g279 (id INTEGER, bal DOUBLE)")
      e.executeDuck(
        """INSERT INTO g279 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 500""".stripMargin)                // v1
      e.executeDuck("PRAGMA create_branch('g279', 'fix')")
      e.executeDuck(
        "UPDATE g279.branch_fix SET bal = bal * 2 WHERE id % 2 = 0")
      e.executeDuck("DELETE FROM g279.branch_fix WHERE id > 450")
      e.executeDuck(
        """INSERT INTO g279.branch_fix
          |SELECT c_custkey + 1000, c_acctbal FROM customer
          |WHERE c_custkey <= 50""".stripMargin)
      val agg = "count(*) AS n, CAST(sum(CAST(bal AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS total"
      def phase(name: String, sql: String) =
        e.executeDuck(sql).select(lit(name).as("phase"), col("n"),
          col("total"))
      val mainBefore = phase("main_before", s"SELECT $agg FROM g279")
      // materialize BEFORE the fast-forward: adoption renames the
      // branch-written data dirs into the parent, so a lazy frame
      // over the branch head would read moved paths
      val branchHead = phase("branch",
        s"SELECT $agg FROM g279 VERSION AS OF 'fix'").localCheckpoint()
      val adopted = e.executeDuck("PRAGMA fast_forward('g279', 'fix')")
        .collect()(0).getLong(1)
      val refsAfter = e.executeDuck("PRAGMA table_refs('g279')").count()
      val out = Seq(mainBefore, branchHead,
        phase("after_ff", s"SELECT $agg FROM g279"))
        .reduce(_.unionByName(_))
        .withColumn("adopted", lit(adopted))
        .withColumn("refs_after", lit(refsAfter))
        .orderBy("phase").localCheckpoint()
      try out finally e.close()
    },
      """WITH v1 AS (SELECT c_custkey AS id, c_acctbal AS bal
        |    FROM customer WHERE c_custkey <= 500),
        |br AS (SELECT id, CASE WHEN id % 2 = 0 THEN bal * 2 ELSE bal
        |    END AS bal FROM v1 WHERE id <= 450
        |  UNION ALL SELECT c_custkey + 1000, c_acctbal FROM customer
        |  WHERE c_custkey <= 50),
        |r AS (
        |  SELECT 'main_before' AS phase, count(*) AS n,
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM v1
        |  UNION ALL SELECT 'branch', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) FROM br
        |  UNION ALL SELECT 'after_ff', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) FROM br)
        |SELECT phase, CAST(n AS BIGINT) AS n, total,
        |  CAST(3 AS BIGINT) AS adopted, CAST(0 AS BIGINT) AS refs_after
        |FROM r ORDER BY phase""".stripMargin,
      headline = true),

    // FULL MERGE GRAMMAR (r15): conditional clauses, MATCHED-DELETE,
    // and NOT MATCHED BY SOURCE in one statement — SQL-standard
    // first-match-wins row semantics over a snapshot-backed table.
    // Two merges: (1) an unconditional CDC delete-apply (key-pruned
    // commitMerge — cost tracks the tombstone batch), then (2) a
    // conditional mirror-sync (one atomic full commitRewrite — the
    // O(table) cost inherent to per-row BY SOURCE semantics). Both
    // land as committed versions, so the phases also pin that time
    // travel spans the merges.
    "q280_sql_merge_full" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g280 (id INTEGER, bal DOUBLE, " +
        "status VARCHAR)")
      e.executeDuck(
        """INSERT INTO g280 SELECT c_custkey, c_acctbal, 'live'
          |FROM customer WHERE c_custkey <= 600""".stripMargin)   // v1
      // (1) tombstone apply: delete every multiple of 7
      e.executeDuck(
        """CREATE TABLE g280_tomb AS SELECT c_custkey AS k FROM customer
          |WHERE c_custkey <= 600 AND c_custkey % 7 = 0""".stripMargin)
      e.executeDuck(
        """MERGE INTO g280 USING g280_tomb ON g280.id = g280_tomb.k
          |WHEN MATCHED THEN DELETE""".stripMargin)               // v2
      // (2) conditional mirror-sync against a fresher source slice
      e.executeDuck(
        """CREATE TABLE g280_src AS
          |SELECT c_custkey AS k, c_acctbal + 10 AS nb FROM customer
          |WHERE c_custkey <= 300""".stripMargin)
      e.executeDuck(
        """MERGE INTO g280 USING g280_src ON g280.id = g280_src.k
          |WHEN MATCHED AND g280.bal < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET bal = g280_src.nb
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'
          |""".stripMargin)                                       // v3
      val agg = "count(*) AS n, CAST(sum(CAST(bal AS DECIMAL(18,2))) " +
        "AS DOUBLE) AS total"
      def phase(name: String, sql: String) =
        e.executeDuck(sql).select(lit(name).as("phase"), col("n"),
          col("total"))
      val out = Seq(
        phase("v1", s"SELECT $agg FROM g280 VERSION AS OF 1"),
        phase("after_delete", s"SELECT $agg FROM g280 VERSION AS OF 2"),
        phase("now", s"SELECT $agg FROM g280"),
        phase("stale", s"SELECT $agg FROM g280 WHERE status = 'stale'"))
        .reduce(_.unionByName(_)).orderBy("phase").localCheckpoint()
      try out finally e.close()
    },
      """WITH v1 AS (SELECT c_custkey AS id, c_acctbal AS bal,
        |    'live' AS status FROM customer WHERE c_custkey <= 600),
        |v2 AS (SELECT * FROM v1 WHERE id % 7 <> 0),
        |src AS (SELECT c_custkey AS k, c_acctbal + 10 AS nb
        |  FROM customer WHERE c_custkey <= 300),
        |v3 AS (
        |  SELECT id, CASE WHEN k IS NOT NULL THEN nb ELSE bal END AS bal,
        |    CASE WHEN k IS NULL THEN 'stale' ELSE status END AS status
        |  FROM v2 LEFT JOIN src ON id = k
        |  WHERE NOT (k IS NOT NULL AND bal < 0)),
        |r AS (
        |  SELECT 'v1' AS phase, count(*) AS n,
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM v1
        |  UNION ALL SELECT 'after_delete', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) FROM v2
        |  UNION ALL SELECT 'now', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) FROM v3
        |  UNION ALL SELECT 'stale', count(*),
        |    CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
        |  FROM v3 WHERE status = 'stale')
        |SELECT phase, CAST(n AS BIGINT) AS n, total FROM r
        |ORDER BY phase""".stripMargin,
      headline = true),

    // §2.9 H2 (r16): the reference's live-introspection entry point —
    // examples/utils.py:13-31 builds its schema prompt by executing
    // literal `information_schema.tables` / `information_schema.columns`
    // SQL. The Engine serves both as DuckDB-shaped views over its own
    // catalog (Engine.refreshInformationSchema); the oracle is DuckDB's
    // OWN information_schema over the same tables, so the shape, the
    // type spellings (BIGINT/INTEGER/VARCHAR/DOUBLE) and the ordinals
    // are pinned engine-to-engine, not hand-written.
    "q281_information_schema" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      try {
        for (t <- Seq("region", "nation", "customer"))
          e.executeDuck(s"CREATE TABLE $t AS SELECT * FROM $t")
        e.executeDuck(
          """SELECT table_name, column_name,
            |  CAST(ordinal_position AS INT) AS ordinal_position,
            |  data_type, is_nullable
            |FROM information_schema.columns
            |WHERE table_name IN ('region', 'nation', 'customer')
            |ORDER BY table_name, ordinal_position""".stripMargin)
          .localCheckpoint()
      } finally e.close()
    },
      """SELECT table_name, column_name,
        |  CAST(ordinal_position AS INT) AS ordinal_position,
        |  data_type, is_nullable
        |FROM information_schema.columns
        |WHERE table_name IN ('region', 'nation', 'customer')
        |ORDER BY table_name, ordinal_position""".stripMargin,
      headline = true),

    // Execution-time manifest pruning from a JOIN plan shape (r16, the
    // r15 verdict's top item): clean snapshot tables now read through a
    // manifest-backed FileIndex (graft.sources.GraftFileIndex), so the
    // filters Spark pushes down to the scan — which exist for ANY plan
    // shape, joins included — consult the manifest's bounds at
    // file-LISTING time. The statement front end (ScanPrune) declines
    // this query outright (JOIN token), which was exactly the r15
    // ceiling: a fact⋈dim query over a snapshot table scanned every
    // file. `pruned` comes from the FileIndex's recorded decision
    // AFTER execution (kept < total over ≥3 banded files); the oracle
    // pins the content AND that skipping really happened.
    "q282_join_pruned_scan" -> api((spark, sfDir) => {
      import graft.sources.GraftFileIndex
      val e = new Engine(spark)
      e.executeDuck("SET auto_stats = true")
      val base = spark.table("lineitem")
        .where(col("l_orderkey") <= 4000)
        .select(concat(col("l_returnflag"), lit("-"),
          lpad(col("l_orderkey").cast("string"), 8, "0")).as("skey"),
          col("l_returnflag").as("flag"), col("l_quantity").as("qty"))
        .localCheckpoint()
      e.register("g282_base", base)
      e.executeDuck("CREATE TABLE g282_f (skey VARCHAR, flag VARCHAR, " +
        "qty DOUBLE)")
      // three banded commits → disjoint per-file skey prefixes (A-/N-/R-)
      Seq("A", "N", "R").foreach { fl =>
        e.executeDuck(
          s"""INSERT INTO g282_f SELECT skey, flag, qty FROM g282_base
             |WHERE flag = '$fl'""".stripMargin)
      }
      e.executeDuck("CREATE TABLE g282_d AS SELECT * FROM (VALUES " +
        "('A', 'returned'), ('N', 'live'), ('R', 'refunded')) " +
        "AS t(flag, label)")
      val joined = e.executeDuck(
        """SELECT d.label AS label, count(f.skey) AS n,
          |  CAST(sum(CAST(f.qty AS DECIMAL(18,2))) AS DOUBLE) AS qty
          |FROM g282_f f JOIN g282_d d ON f.flag = d.flag
          |WHERE f.skey BETWEEN 'N-00000500' AND 'N-00002500'
          |GROUP BY d.label ORDER BY label""".stripMargin)
        .localCheckpoint() // execute: listFiles records its decision
      val dir = e.snapshotDir("g282_f").get
      val (kept, total) = GraftFileIndex.lastPrune
        .getOrDefault(dir, (0, 0))
      val out = joined
        .withColumn("pruned", lit(total >= 3 && kept < total))
        .localCheckpoint()
      try out finally {
        graft.operators.SnapshotOps.releaseCheckpoint(base)
        graft.operators.SnapshotOps.releaseCheckpoint(joined)
        e.close()
      }
    },
      """WITH f AS (SELECT l_returnflag || '-' ||
        |    lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS skey,
        |    l_returnflag AS flag, l_quantity AS qty
        |  FROM lineitem WHERE l_orderkey <= 4000),
        |d(flag, label) AS (VALUES
        |  ('A', 'returned'), ('N', 'live'), ('R', 'refunded'))
        |SELECT d.label AS label, count(f.skey) AS n,
        |  CAST(sum(CAST(f.qty AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  TRUE AS pruned
        |FROM f JOIN d ON f.flag = d.flag
        |WHERE f.skey BETWEEN 'N-00000500' AND 'N-00002500'
        |GROUP BY d.label ORDER BY label""".stripMargin,
      headline = true),

    // Maintenance policy lifecycle (r16, the r15 verdict's #8): the
    // commit-time debt check — manifest metadata only — flags when the
    // merge-on-read read-tax model crosses its threshold (dead rows ≥
    // 10% of data rows, or ≥ 8 stacked delete files), surfaced via
    // PRAGMA table_maintenance; `SET auto_compact = true` makes the
    // NEXT commit pay the flagged debt as one committed compaction
    // (DV lines bake in, time travel spans it). The oracle rederives
    // the row counts AND the dv_rows debt relationally, and pins the
    // flag/reason transitions.
    "q284_maintenance_policy" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("SET delete_mode = 'mor'")
      e.executeDuck("CREATE TABLE g284 (id INTEGER, bal DOUBLE)")
      e.executeDuck(
        """INSERT INTO g284 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 1000""".stripMargin)
      def phase(p: String) = {
        val m = e.executeDuck("PRAGMA table_maintenance('g284')")
          .collect()(0)
        e.executeDuck("SELECT count(*) AS n FROM g284")
          .select(lit(p).as("phase"), col("n"),
            lit(m.getLong(4)).as("dv_rows"),
            lit(m.getBoolean(7)).as("flagged"),
            lit(m.getString(8).startsWith("auto_compacted"))
              .as("auto_paid"))
      }
      val p0 = phase("a_ingest")
      // ~14% of rows delete as one DV — over the 10% row-tax threshold
      e.executeDuck("DELETE FROM g284 WHERE id % 7 = 0")
      val p1 = phase("b_mor_debt")
      // the next commit's policy check pays the flagged debt
      e.executeDuck("SET auto_compact = true")
      e.executeDuck("DELETE FROM g284 WHERE id % 11 = 0 AND id % 7 <> 0")
      val p2 = phase("c_auto_compacted")
      val out = Seq(p0, p1, p2).reduce(_.unionByName(_))
        .orderBy("phase").localCheckpoint()
      try out finally e.close()
    },
      """WITH base AS (SELECT c_custkey AS id FROM customer
        |  WHERE c_custkey <= 1000),
        |v2 AS (SELECT id FROM base WHERE id % 7 <> 0),
        |v3 AS (SELECT id FROM v2 WHERE id % 11 <> 0 OR id % 7 = 0)
        |SELECT 'a_ingest' AS phase, (SELECT count(*) FROM base) AS n,
        |  CAST(0 AS BIGINT) AS dv_rows, FALSE AS flagged,
        |  FALSE AS auto_paid
        |UNION ALL
        |SELECT 'b_mor_debt',
        |  (SELECT count(*) FROM v2),
        |  (SELECT count(*) FROM base WHERE id % 7 = 0),
        |  TRUE, FALSE
        |UNION ALL
        |SELECT 'c_auto_compacted',
        |  (SELECT count(*) FROM v3),
        |  CAST(0 AS BIGINT), FALSE, TRUE
        |ORDER BY phase""".stripMargin,
      headline = true),

    // Vanilla-Spark write path (r16): a user builds and evolves a
    // snapshot table with NOTHING but the stock DataFrameWriter —
    // `df.write.format("graft").mode(…).save(dir)` — no Engine, no
    // SQL front end. Two appends band the table (stats options feed
    // manifest skipping), an overwrite replaces content as ONE
    // committed version, and the stock reader time-travels across
    // all three: the full table lifecycle through public Spark API
    // only. The oracle rederives both phases' aggregates
    // relationally from customer.
    "q285_spark_write_path" -> api((spark, sfDir) => {
      val dir = java.nio.file.Files.createTempDirectory("g285")
        .toString + "/t"
      val c = spark.table("customer").select(
        col("c_custkey").as("id"), col("c_acctbal").as("bal"))
      c.where(col("id") % 2 === 0)
        .write.format("graft").mode("append")
        .option("statsCols", "id").save(dir)                       // v1
      c.where(col("id") % 2 === 1)
        .write.format("graft").mode("append")
        .option("statsCols", "id").save(dir)                       // v2
      c.where(col("id") % 3 === 0)
        .withColumn("bal", col("bal") + 10)
        .write.format("graft").mode("overwrite").save(dir)         // v3
      def phase(p: String, df: org.apache.spark.sql.DataFrame) = df.agg(
        count(lit(1)).as("n"),
        sum(col("bal").cast("decimal(18,2)")).cast("double")
          .as("bal_sum"))
        .select(lit(p).as("phase"), col("n"), col("bal_sum"))
      val out = phase("a_appended", spark.read.format("graft")
          .option("versionAsOf", "2").load(dir))
        .unionByName(phase("b_overwritten",
          spark.read.format("graft").load(dir)))
        .orderBy("phase").localCheckpoint()
      // out is materialized; the scratch table can go
      val walk = Files.walk(new java.io.File(dir).getParentFile.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
      out
    },
      """SELECT 'a_appended' AS phase, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS bal_sum
        |FROM customer
        |UNION ALL
        |SELECT 'b_overwritten', count(*),
        |  CAST(sum(CAST(c_acctbal + 10 AS DECIMAL(18,2))) AS DOUBLE)
        |FROM customer WHERE c_custkey % 3 = 0
        |ORDER BY phase""".stripMargin,
      headline = true),

    // Native streaming sink (r16): table-to-table replication through
    // STOCK streaming API only — readStream over the source snapshot
    // table, writeStream.format("graft") into the sink, one committed
    // version per micro-batch with the exactly-once txn watermark
    // (the q240/q259 foreachBatch idiom, now a format). Phase a reads
    // the replicated head (2 epochs = 2 sink versions); phase b
    // time-travels the SINK to epoch 1's commit — streaming ingest
    // yields a time-travelable history by construction.
    "q286_stream_native_sink" -> api((spark, sfDir) => {
      import graft.operators.SnapshotOps
      val root = java.nio.file.Files.createTempDirectory("g286")
      val (src, dst) = (s"$root/src", s"$root/dst")
      val c = spark.table("customer").select(
        col("c_custkey").as("id"), col("c_acctbal").as("bal"))
      SnapshotOps.commitAppend(spark, src, c.where(col("id") % 2 === 0))
      SnapshotOps.commitAppend(spark, src, c.where(col("id") % 2 === 1))
      val q = spark.readStream.format("graft-snapshot")
        .option("path", src).option("maxVersionsPerBatch", "1").load()
        .writeStream.format("graft")
        .option("path", dst).option("txnAppId", "g286")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def phase(p: String, df: org.apache.spark.sql.DataFrame) = df.agg(
        count(lit(1)).as("n"),
        sum(col("bal").cast("decimal(18,2)")).cast("double")
          .as("bal_sum"))
        .select(lit(p).as("phase"), col("n"), col("bal_sum"),
          lit(SnapshotOps.currentVersion(dst).toLong).as("versions"))
      val out = phase("a_replicated_head",
          spark.read.format("graft").load(dst))
        .unionByName(phase("b_epoch1_travel",
          spark.read.format("graft").option("versionAsOf", "1")
            .load(dst)))
        .orderBy("phase").localCheckpoint()
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
      out
    },
      """SELECT 'a_replicated_head' AS phase, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS bal_sum,
        |  CAST(2 AS BIGINT) AS versions
        |FROM customer
        |UNION ALL
        |SELECT 'b_epoch1_travel', count(*),
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE),
        |  CAST(2 AS BIGINT)
        |FROM customer WHERE c_custkey % 2 = 0
        |ORDER BY phase""".stripMargin,
      headline = true),

    // TRUNCATE TABLE (r16): one committed overwrite of the empty
    // frame — NOT a wipe. Phase b proves the head is empty while the
    // pre-truncate version still time-travels; phase c proves the
    // chain continues (a later insert is just the next version). The
    // oracle rederives each phase relationally.
    "q287_sql_truncate" -> api((spark, sfDir) => {
      val e = new Engine(spark)
      e.executeDuck("CREATE TABLE g287 (id INTEGER, bal DOUBLE)")
      e.executeDuck(
        """INSERT INTO g287 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 500""".stripMargin)                  // v1
      e.executeDuck("TRUNCATE TABLE g287")                         // v2
      e.executeDuck(
        """INSERT INTO g287 SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_custkey <= 100""".stripMargin)                  // v3
      val out = e.executeDuck(
        """SELECT 'a_head' AS phase, count(*) AS n FROM g287
          |UNION ALL
          |SELECT 'b_pre_truncate',
          |  (SELECT count(*) FROM g287 VERSION AS OF 1)
          |UNION ALL
          |SELECT 'c_truncated_head',
          |  (SELECT count(*) FROM g287 VERSION AS OF 2)
          |ORDER BY phase""".stripMargin).localCheckpoint()
      try out finally e.close()
    },
      """SELECT 'a_head' AS phase, count(*) AS n FROM customer
        |  WHERE c_custkey <= 100
        |UNION ALL
        |SELECT 'b_pre_truncate', count(*) FROM customer
        |  WHERE c_custkey <= 500
        |UNION ALL
        |SELECT 'c_truncated_head', 0
        |ORDER BY phase""".stripMargin)
  )
}
