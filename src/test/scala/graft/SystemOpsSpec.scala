package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaOps, Summarize}
import graft.streaming.StreamingOps

/** Streaming/multimodal/profiling semantics not covered by the SQL
  * oracles. */
class SystemOpsSpec extends SparkSpecBase {

  test("streaming windowed counts equal the batch answer") {
    Queries.prep(spark, sfDir)
    val streamed = StreamingOps.windowedEventCounts(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = spark.sql(
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("streaming sessionization equals batch gaps-and-islands") {
    Queries.prep(spark, sfDir)
    val streamed = StreamingOps.sessionCounts(spark, sfDir, 30)
      .collect().map(_.toSeq).toSeq
    val batch = spark.sql(
      """WITH m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
        |  THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, sum(new_s) AS n_sessions,
        |  count(*) AS total_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("streaming bloom dedup equals the batch bloom dedup (and the " +
      "plain anti-join)") {
    Queries.prep(spark, sfDir)
    import graft.operators.TextOps
    val streamed = graft.streaming.StreamingOps
      .streamBloomDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val d = spark.table("documents").select(col("doc_id"),
      TextOps.leadFingerprint(col("text"), 50).as("fp"))
    val batch = TextOps.bloomNewDocs(
        d.where(pmod(col("doc_id"), lit(2)) === 1),
        d.where(pmod(col("doc_id"), lit(2)) === 0), "fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    Queries.prep(spark, sfDir)
    val streamed = StreamingOps.streamIntervalJoin(spark, sfDir, 30)
      .collect().map(_.toSeq).toSeq
    val batch = spark.sql(
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("image decode: ImageIO stats match the independently computed " +
      "fixture expectation") {
    Queries.prep(spark, sfDir)
    val got = MediaOps.imageFeatures(MediaOps.imageTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = spark.read
      .parquet("/root/repo/fixtures/media/expected.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("image resize: stride-2 downsample stats match the fixture and " +
      "a hand-checkable JDK-encoded image") {
    Queries.prep(spark, sfDir)
    val got = MediaOps.imageResizeFeatures(MediaOps.imageTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = spark.read
      .parquet("/root/repo/fixtures/media/resize_expected.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got == want)
    // hand check: a 3x3 image keeps exactly its (0,0),(0,2),(2,0),(2,2)
    // corners — dims ceil(3/2)=2 and sums over the four corner pixels
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 3)
      img.setRGB(x, y, (x * 10 + y) << 16 | 200 << 8 | 7)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val s = MediaOps.decodeImageResizeStats(bos.toByteArray)
    assert((s.width, s.height) == (2L, 2L))
    assert(s.sum_r == 0 + 20 + 2 + 22)
    assert(s.sum_g == 4 * 200 && s.sum_b == 4 * 7)
  }

  test("binaryFile ingestion: file-sourced decode equals the parquet-" +
      "sourced decode row for row") {
    Queries.prep(spark, sfDir)
    val viaFiles = MediaOps.imageFeatures(
        MediaOps.imageFilesTable(spark, "/tmp/graft_media_files_spec")
          .join(broadcast(spark.table("documents").select(col("doc_id"))),
            col("media_id") === col("doc_id"), "leftsemi"))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    val viaParquet = MediaOps.imageFeatures(MediaOps.imageTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(viaFiles.nonEmpty && viaFiles == viaParquet)
  }

  test("image decode: batched path is bit-identical to the Column path " +
      "and invariant to batch size / partitioning") {
    Queries.prep(spark, sfDir)
    val images = MediaOps.imageTable(spark)
    val colPath = MediaOps.imageFeatures(images)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      MediaOps.imageFeaturesBatched(df, batchSize = bs)
        .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(run(images, 32) == colPath)
    assert(run(images, 7) == colPath)
    assert(run(images.repartition(13), 32) == colPath)
  }

  test("image decode rejects undecodable payloads loudly") {
    val bad = Array[Byte](1, 2, 3, 4)
    val e = intercept[IllegalArgumentException] {
      MediaOps.decodeImageStats(bad)
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("audio decode: RIFF/PCM stats match the independently computed " +
      "fixture expectation") {
    Queries.prep(spark, sfDir)
    val got = MediaOps.audioFeatures(MediaOps.audioTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = spark.read
      .parquet("/root/repo/fixtures/media/audio_expected.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  /** Minimal PCM16 WAV builder (mono/stereo interleaved). */
  private def buildWav(samples: Seq[Int], channels: Int,
      rate: Int): Array[Byte] = {
    val dataLen = samples.size * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("audio resample: decimate-by-2 stats match the fixture and the " +
      "stride rule on a hand-built WAV") {
    Queries.prep(spark, sfDir)
    val got = MediaOps.audioResampleFeatures(MediaOps.audioTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = spark.read
      .parquet("/root/repo/fixtures/media/audio_resample_expected.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got == want)
    // hand check on 5 mono frames [1, -2, 3, -4, 5]: kept = [1, 3, 5]
    // (no sign changes), rate 8000 -> 4000
    val s = MediaOps.decodeWavResampleStats(
      buildWav(Seq(1, -2, 3, -4, 5), channels = 1, rate = 8000))
    assert(s == MediaOps.AudioStats(3, 4000, 1, 9, 5, 35, 0))
  }

  test("audio decode: batched path is bit-identical to the Column path " +
      "and invariant to batch size / partitioning") {
    Queries.prep(spark, sfDir)
    val audio = MediaOps.audioTable(spark)
    val colPath = MediaOps.audioFeatures(audio)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      MediaOps.audioFeaturesBatched(df, batchSize = bs)
        .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(run(audio, 32) == colPath)
    assert(run(audio, 7) == colPath)
    assert(run(audio.repartition(13), 32) == colPath)
  }

  test("audio decode: hand-built WAV yields hand-computed stats") {
    // 1 channel, 8000 Hz, 4 frames: samples 100, -200, 300, 0
    val samples = Seq[Short](100, -200, 300, 0)
    val dataLen = samples.size * 2
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    val s = MediaOps.decodeWavStats(bb.array())
    assert(s == MediaOps.AudioStats(n_frames = 4, sample_rate = 8000,
      channels = 1, sum_abs = 600, peak = 300,
      energy = 100L * 100 + 200L * 200 + 300L * 300,
      zero_cross = 2)) // 100→-200 and -200→300 flip; 300→0 does not
  }

  test("audio decode rejects non-WAV payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      MediaOps.decodeWavStats(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("not a RIFF/WAVE"))
  }

  test("video decode: multi-frame GIF stats match the independently " +
      "computed fixture expectation") {
    Queries.prep(spark, sfDir)
    val got = MediaOps.videoFeatures(MediaOps.videoTable(spark))
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    val want = spark.read
      .parquet("/root/repo/fixtures/media/video_expected.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(got == want)
    // the fixture really is multi-frame: every clip has >= 2 frames
    assert(got.forall(_(1).asInstanceOf[Long] >= 2L))
  }

  test("video decode: batched path is bit-identical to the Column path " +
      "and invariant to batch size / partitioning") {
    Queries.prep(spark, sfDir)
    val video = MediaOps.videoTable(spark)
    val colPath = MediaOps.videoFeatures(video)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      MediaOps.videoFeaturesBatched(df, batchSize = bs)
        .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(run(video, 32) == colPath)
    assert(run(video, 7) == colPath)
    assert(run(video.repartition(13), 32) == colPath)
  }

  test("video embedding: real per-frame kernel equals the pooled-hist " +
      "fractions derived from the integer stats") {
    Queries.prep(spark, sfDir)
    val emb = MediaOps.extractFeaturesVideo(MediaOps.videoTable(spark))
      .orderBy("media_id").collect()
    assert(emb.nonEmpty)
    val stats = MediaOps.videoFeatures(MediaOps.videoTable(spark))
      .orderBy("media_id").collect()
    emb.zip(stats).foreach { case (e, s) =>
      assert(e.getAs[Long]("media_id") == s.getAs[Long]("media_id"))
      val n = s.getAs[Long]("n_frames")
      assert(e.getAs[Int]("n_frames").toLong == n)
      val px = (n * s.getAs[Long]("width") * s.getAs[Long]("height")).toDouble
      val want = (0 until 8).map(j =>
        graft.functions.GraftVector.duckRound(
          s.getAs[Long](s"h$j") / px, 6))
      assert(e.getSeq[Double](e.fieldIndex("embedding")) == want)
    }
  }

  test("video decode rejects non-GIF and truncated payloads loudly") {
    val e = intercept[Exception] {
      MediaOps.decodeGifStats(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage != null)
    // a real clip truncated mid-stream must not decode silently to
    // zero frames
    val whole = spark.read
      .parquet("/root/repo/fixtures/media/gifs.parquet")
      .where(col("media_id") === 0).select("gif")
      .head().getAs[Array[Byte]](0)
    intercept[Exception] {
      MediaOps.decodeGifStats(whole.take(20))
    }
  }

  /** A syntactically valid WAV header followed by `chunks`, for the
    * malformed-payload negative tests. */
  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  private def chunk(id: String, declaredSize: Int,
      payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(declaredSize).put(payload)
    bb.array()
  }

  test("audio decode rejects a truncated chunk with a clear message, " +
      "not an index error") {
    // declared data size 1000 but only 4 bytes present
    val bad = riff(chunk("data", 1000, Array[Byte](0, 0, 0, 0)))
    val e = intercept[IllegalArgumentException] {
      MediaOps.decodeWavStats(bad)
    }
    assert(e.getMessage.contains("exceeds payload"), e.getMessage)
  }

  test("audio decode rejects a crafted near-2^31 chunk size loudly " +
      "(no Int overflow in the walk)") {
    val bad = riff(chunk("JUNK", Int.MaxValue - 4, Array[Byte](0, 0)))
    val e = intercept[IllegalArgumentException] {
      MediaOps.decodeWavStats(bad)
    }
    assert(e.getMessage.contains("exceeds payload"), e.getMessage)
  }

  test("audio decode rejects an undersized fmt chunk loudly " +
      "(no field reads past the declared length)") {
    // fmt declares 4 bytes — too short for the 16-byte PCM field block
    val bad = riff(
      chunk("fmt ", 4, Array[Byte](1, 0, 1, 0)),
      chunk("data", 2, Array[Byte](0, 0)))
    val e = intercept[IllegalArgumentException] {
      MediaOps.decodeWavStats(bad)
    }
    assert(e.getMessage.contains("fmt chunk: size 4 < 16"), e.getMessage)
  }

  test("batched media paths preserve a non-numeric media_id type " +
      "(schema parity with the Column path)") {
    Queries.prep(spark, sfDir)
    val img = MediaOps.imageTable(spark)
      .withColumn("media_id", concat(lit("img-"), col("media_id")))
    val colPath = MediaOps.imageFeatures(img)
    val batched = MediaOps.imageFeaturesBatched(img, batchSize = 7)
    assert(batched.schema.map(f => (f.name, f.dataType)) ==
      colPath.schema.map(f => (f.name, f.dataType)))
    assert(batched.orderBy("media_id").collect().map(_.toSeq).toSeq ==
      colPath.orderBy("media_id").collect().map(_.toSeq).toSeq)

    val aud = MediaOps.audioTable(spark)
      .withColumn("media_id", concat(lit("wav-"), col("media_id")))
    val aCol = MediaOps.audioFeatures(aud)
    val aBat = MediaOps.audioFeaturesBatched(aud, batchSize = 7)
    assert(aBat.schema.map(f => (f.name, f.dataType)) ==
      aCol.schema.map(f => (f.name, f.dataType)))
    assert(aBat.orderBy("media_id").collect().map(_.toSeq).toSeq ==
      aCol.orderBy("media_id").collect().map(_.toSeq).toSeq)
  }

  test("compaction collapses the fragmented file count and preserves " +
      "content exactly") {
    Queries.prep(spark, sfDir)
    SparkEntry.queries("q196_compaction")(spark, sfDir).collect()
    val dir = SystemQueries.runScopedDir("/tmp/graft_q196", sfDir)
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val frag = parts(s"$dir/fragmented")
    val comp = parts(s"$dir/compacted")
    assert(frag >= 32, s"fragmented wrote only $frag files")
    assert(comp <= 2, s"compacted still has $comp files")
    // content equality beyond the entry's checksum: full row multiset
    val a = spark.read.parquet(s"$dir/fragmented")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = spark.read.parquet(s"$dir/compacted")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("scratch-dir entries return MATERIALIZED frames: collect survives " +
      "deleting the scratch dir (no lazy /tmp re-read at action time)") {
    // r9 driver-red class: q194/q196/q211/q226 returned plans that
    // lazily re-read parquet written inside the entry fn, so a second
    // invocation in the same JVM (shared runToken) could overwrite the
    // dir under the first invocation's deferred actions. The fix is an
    // eager localCheckpoint before returning; this pins it by wiping
    // the scratch root entirely and re-collecting — a lazy plan throws
    // FileNotFound here, a materialized one is unaffected.
    Queries.prep(spark, sfDir)
    def wipe(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete()
    }
    val entries = Seq("q194_merge_schema_read" -> "/tmp/graft_q194",
      "q196_compaction" -> "/tmp/graft_q196",
      "q211_zorder_layout" -> "/tmp/graft_q211",
      "q226_time_travel" -> "/tmp/graft_q226")
    entries.foreach { case (name, root) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val snap = df.collect().map(_.toSeq).toSeq
      wipe(new java.io.File(root))
      assert(df.collect().map(_.toSeq).toSeq == snap, name)
    }
  }

  test("bucketed join runs with no exchange below the sort-merge join") {
    Queries.prep(spark, sfDir)
    graft.operators.JoinOps.resetManagedTable(spark, "graft_li_bucketed")
    graft.operators.JoinOps.resetManagedTable(spark, "graft_ord_bucketed")
    spark.table("lineitem").select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_li_bucketed")
    spark.table("orders").select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_ord_bucketed")
    val j = spark.table("graft_li_bucketed").hint("merge")
      .join(spark.table("graft_ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    assert(j.count() > 0)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("media features: fixed shape, bounded frames, deterministic") {
    Queries.prep(spark, sfDir)
    val media = MediaOps.mediaTable(spark.table("documents"))
    val f1 = MediaOps.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.nonEmpty)
    // fixed-width embedding, bounded frame count
    assert(f1.forall(_.getAs[Seq[Double]]("embedding").length == 8))
    assert(f1.forall(r => r.getAs[Int]("n_frames") >= 1 &&
      r.getAs[Int]("n_frames") <= 16))
    // deterministic across runs
    val f2 = MediaOps.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
  }

  test("batched decode path is bit-identical to the Column path") {
    Queries.prep(spark, sfDir)
    val media = MediaOps.mediaTable(spark.table("documents"))
    val colPath = MediaOps.extractFeatures(media)
      .select(col("media_id").cast("long"), col("n_frames"),
        col("embedding"))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    val batched = MediaOps.extractFeaturesBatched(media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    assert(colPath.toSeq == batched.toSeq)
  }

  test("batched decode is invariant to batch size and partitioning") {
    Queries.prep(spark, sfDir)
    val media = MediaOps.mediaTable(spark.table("documents"))
    def run(m: org.apache.spark.sql.DataFrame, bs: Int) =
      MediaOps.extractFeaturesBatched(m, batchSize = bs)
        .orderBy("media_id").collect().map(_.toSeq).toSeq
    val base = run(media, 32)
    // batch boundaries must not leak into results…
    assert(run(media, 7) == base)
    // …nor must the physical partitioning
    assert(run(media.repartition(13), 32) == base)
  }

  test("dHash: known-value on a constructed gradient, full fixture " +
      "parity, and banded pairs equal the quadratic definition") {
    // hand-checkable: left-to-right luma ramp -> every horizontal
    // comparison is "brighter", all 64 bits set
    val img = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18) {
      val v = x * 14
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    assert(MediaOps.decodeImageDHash(baos.toByteArray) == -1L) // all 64 bits
    // decode+hash parity against the raw-pixel-array fixture stack
    val pngs = spark.read.parquet("/root/repo/fixtures/dhash/pngs.parquet")
    val got = MediaOps.imageDHash(pngs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read
      .parquet("/root/repo/fixtures/dhash/expected.parquet").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // banded kernel == quadratic pairs at the q205 threshold
    val banded = graft.operators.TextOps.hammingPairs(
        MediaOps.imageDHash(pngs), "media_id", "dhash",
        bits = 64, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quad = (for {
      (a, ha) <- want; (b, hb) <- want if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b)).toSet
    assert(banded == quad && quad.nonEmpty)
  }

  test("audio fingerprint: known-value on a constructed ramp and full " +
      "fixture parity") {
    // hand-checkable: amplitude grows with time -> every bin-energy
    // comparison is "louder", all 64 bits set
    val n = 6500
    val samples = Array.tabulate(n)(t => ((t / 100) * (if (t % 2 == 0) 1
      else -1)).toShort)
    val bos = new java.io.ByteArrayOutputStream()
    val data = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(data.putShort)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    bos.write("RIFF".getBytes); bos.write(le32(36 + n * 2))
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(16))
    bos.write(le16(1)); bos.write(le16(1)); bos.write(le32(8000))
    bos.write(le32(16000)); bos.write(le16(2)); bos.write(le16(16))
    bos.write("data".getBytes); bos.write(le32(n * 2))
    bos.write(data.array())
    assert(MediaOps.decodeAudioFingerprint(bos.toByteArray) == -1L)
    // decode+fingerprint parity against the raw-sample fixture stack
    val got = MediaOps.audioFingerprint(spark.read
        .parquet("/root/repo/fixtures/afp/wavs.parquet")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read
      .parquet("/root/repo/fixtures/afp/expected.parquet").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("zorder layout prunes a 2-d box query harder than a linear " +
      "sort, and the interleave is the textbook morton code") {
    import graft.operators.LayoutOps
    import spark.implicits._
    // hand-checkable interleave: a=0b101, b=0b011 -> z=0b010111? no:
    // bit i of a at 2i, of b at 2i+1: a bits (1,0,1), b bits (1,1,0)
    // -> positions: a0=1@0, b0=1@1, a1=0@2, b1=1@3, a2=1@4, b2=0@5
    // = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(LayoutOps.zOrder2(col("a"), col("b"), 3)).head.getLong(0)
    assert(z == 27L)
    // uniform 2-d grid: 256x256 keys, one row each
    val grid = (for (a <- 0 until 256; b <- 0 until 256)
      yield (a.toLong, b.toLong)).toDF("ka", "kb")
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec").toString
    LayoutOps.zorderWrite(grid, "ka", "kb", s"$base/z", nFiles = 64,
      bits = 8)
    grid.repartitionByRange(64, col("ka"), col("kb"))
      .sortWithinPartitions("ka", "kb")
      .write.mode("overwrite").parquet(s"$base/linear")
    def frac(dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long) =
      LayoutOps.boxScanFraction(spark, dir, "ka", "kb",
        aLo, aHi, bLo, bHi)
    // shape 1: box on the LEADING dimension — linear's home game, it
    // may win; zorder must still prune to a small fraction
    val zA = frac(s"$base/z", 60, 70, 0, 255)
    // shape 2: box on the SECOND dimension — linear cannot prune AT
    // ALL (every file spans all kb); zorder's boxes are tight in both
    val zB = frac(s"$base/z", 0, 255, 60, 70)
    val lB = frac(s"$base/linear", 0, 255, 60, 70)
    // shape 3: box in both dimensions
    val zAB = frac(s"$base/z", 60, 70, 60, 70)
    val lAB = frac(s"$base/linear", 60, 70, 60, 70)
    val lA = frac(s"$base/linear", 60, 70, 0, 255)
    assert(lB == 1.0, s"linear should be unable to prune kb, got $lB")
    assert(zB < 0.5 * lB, s"zorder on kb: $zB")
    // file boundaries come from RangePartitioner SAMPLING, so the box
    // intersects 8 or occasionally 9 of the 64 files — bound at 10
    assert(zAB <= 10.0 / 64, s"zorder on the 2-d box: $zAB")
    assert(zA <= 0.5, s"zorder on ka alone: $zA")
    // the mixed-shape workload (the case the layout exists for) is
    // strictly cheaper under zorder
    assert((zA + zB + zAB) / 3 < (lA + lB + lAB) / 3,
      s"zorder (${(zA + zB + zAB) / 3}) vs linear (${(lA + lB + lAB) / 3})")
  }

  test("constraint suite counts violations on dirty data and folds " +
      "row checks into one aggregate pass") {
    import graft.operators.ConstraintOps._
    import spark.implicits._
    val dirty = Seq(
      (Some(1L), 10, "A"), (Some(2L), 99, "A"), // one range violation
      (None, 5, "N"),                           // one null key
      (Some(4L), 5, "X"), (Some(4L), 5, "X")    // domain x2 + dup key
    ).toDF("k", "q", "f")
    val got = report(Seq(
      rowChecks(dirty, Seq(
        "complete" -> col("k").isNotNull,
        "range" -> col("q").between(1, 50),
        "domain" -> col("f").isin("A", "N"))),
      uniqueCheck(dirty, "unique", Seq("k")),
      refCheck(dirty, "k", Seq(1L, 2L, 4L).toDF("pk"), "pk", "fk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("complete") == ((1L, false)))
    assert(got("range") == ((1L, false)))
    assert(got("domain") == ((2L, false)))
    assert(got("unique") == ((1L, false)))
    // the null-key row has no parent but NOT IN-style anti-join drops
    // null fk rows; left_anti keeps them — pin the chosen semantics
    assert(got("fk") == ((1L, false)))
    // single-scan claim: the row-check plan contains exactly one scan
    val plan = rowChecks(dirty, Seq("a" -> col("k").isNotNull,
      "b" -> (col("q") > 0))).queryExecution.optimizedPlan.toString
    assert("LocalRelation|Relation".r.findAllIn(plan).length == 1, plan)
  }

  test("media payload survives the binary column (roundtrip)") {
    Queries.prep(spark, sfDir)
    val back = MediaOps.mediaTable(spark.table("documents"))
      .select(col("media_id"), decode(col("payload"), "utf-8").as("text2"))
      .join(spark.table("documents"),
        col("media_id") === col("doc_id"))
      .where(col("text2") =!= col("text"))
    assert(back.count() == 0)
  }

  test("summarize computes exact stats in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0), (4L, "a", 40.0))
      .toDF("id", "s", "v")
    val s = Summarize.summarize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(s("id").getString(1) == "BIGINT")
    assert(s("s").getString(1) == "VARCHAR")
    assert(s("v").getString(1) == "DOUBLE")
    assert(s("v").getAs[Double]("avg") == 25.0)
    assert(s("id").getAs[Long]("count") == 4L)
    assert(s("s").getAs[Double]("null_percentage") == 25.0)
    assert(s("v").getString(s.head._2.fieldIndex("min")) == "10.0")
  }

  test("summarize scans the input exactly once") {
    Queries.prep(spark, sfDir)
    val df = spark.table("customer")
    val plan = Summarize.summarize(df) // forces the agg; now inspect input
    assert(plan.count() == df.schema.fields.length)
  }

  test("describe renders DuckDB type names") {
    Queries.prep(spark, sfDir)
    val d = Summarize.describe(spark.table("embeddings")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("vec_id") == "BIGINT")
    assert(d("embedding") == "FLOAT[]")
    assert(d("label") == "INTEGER")
  }

  test("portable md5 minhash matches an independent per-position " +
      "re-derivation") {
    import spark.implicits._
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), (3L, "solo"))
    val got = texts.toDF("id", "text")
      .select(col("id"), graft.functions.GraftFunctions.minhashMd5(
        graft.operators.TextOps.wordShingles(col("text"), 3), lit(4))
        .as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // independent reference: hex-string md5 via MessageDigest + format,
    // first 12 hex chars parsed — the DuckDB oracle's exact recipe
    def ref(text: String, k: Int): Seq[Long] = {
      val toks = text.trim.split("\\s+").toSeq
      val shingles = (0 until math.max(toks.length - 2, 1)).map { i =>
        toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")
      }.distinct
      (0 until k).map { j =>
        shingles.map { s =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest((s"$j|$s").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(12), 16)
        }.min
      }
    }
    texts.foreach { case (id, t) =>
      assert(got(id) == ref(t, 4), s"doc $id")
    }
  }

  test("streaming near-dup pairs: planted near-dup detected, output " +
      "matches the batch within-bucket quadratic answer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus with one planted near-dup pair and distinct chaff, written
    // to a temp dir so the file-stream source replays it
    val base = (1 to 40).map(i =>
      s"sentence $i of the planted corpus about topic-${i % 7}")
      .mkString(" ")
    val near = base.replace("topic-3", "topic-9")
    val chaff = (1 to 20).map(i => (200L + i,
      s"unrelated document $i with its own words alpha-$i beta-$i " +
        s"gamma-$i delta-$i epsilon-$i zeta-$i eta-$i theta-$i"))
    val docs = ((100L, base) +: (101L, near) +: chaff)
      .toDF("doc_id", "text")
    // documents.parquet must be a FILE (like the testdata layout — the
    // stream source globs on the file name): write then move the part
    val dir = java.nio.file.Files
      .createTempDirectory("graft_neardup").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val streamed = StreamingOps.streamNearDupPairs(spark, dir)
      .select("id_a", "id_b", "n_agree")
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed.exists(p => p._1 == 100L && p._2 == 101L),
      s"planted pair missing: $streamed")
    // batch reference: same portable signature, same banding, same
    // agreement rule, computed with plain DataFrame ops
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.functions.GraftFunctions.minhashMd5(
        graft.operators.TextOps.wordShingles(col("text"), 3), lit(16))
        .as("sig"))
      .as[(Long, Seq[Long])].collect()
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if (0 until 8).exists(band =>
        sa.slice(band * 2, band * 2 + 2) == sb.slice(band * 2, band * 2 + 2))
      n = (0 until 16).count(j => sa(j) == sb(j)) if n >= 8
    } yield (ia, ib, n)).toSet
    assert(streamed == want, s"streamed=$streamed want=$want")
  }

  test("cluster-safe split: no near-dup pair spans two splits, every " +
    "doc is assigned, and the assignment is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val assign = SparkEntry.queries("q214_cluster_safe_split")(spark, sfDir)
      .cache()
    val docs = spark.table("documents")
    assert(assign.count() == docs.count())
    assert(assign.select("split").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // the governance property: members of one near-dup pair always land
    // in the SAME split (q64 detects exactly this leak on the q63
    // content-hash split; here it must be structurally impossible)
    val pairs = graft.operators.TextOps.minhashDupPairs(docs,
      "doc_id", "text", threshold = 0.5)
    val leaked = pairs
      .join(assign.select(col("doc_id").as("id_a"),
        col("split").as("sa")), "id_a")
      .join(assign.select(col("doc_id").as("id_b"),
        col("split").as("sb")), "id_b")
      .where(col("sa") =!= col("sb")).count()
    assert(leaked == 0L)
    assign.unpersist()
  }

  test("epoch shuffle: deterministic across runs, pos is dense per " +
    "shard, and the permutation covers the corpus exactly once") {
    import org.apache.spark.sql.functions._
    val a = SparkEntry.queries("q215_epoch_shuffle")(spark, sfDir).collect()
    val b = SparkEntry.queries("q215_epoch_shuffle")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    val docs = a.map(_.getLong(2))
    assert(docs.toSet.size == docs.length) // a permutation: no dup, no drop
    val byShard = a.groupBy(_.getLong(0))
    byShard.foreach { case (_, rows) =>
      val ps = rows.map(r => r.getInt(1)).sorted
      assert(ps.toSeq == (1 to rows.length).toSeq) // dense 1..n per shard
    }
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
  }

  test("SFT packing: offsets chain exactly, and a completion_split " +
    "example always crosses a chunk boundary") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val rows = SparkEntry.queries("q218_sft_pack_masks")(spark, sfDir)
      .collect()
    // gstart is an exact exclusive prefix sum in doc_id order
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(4) == a.getLong(4) + a.getLong(3),
          s"offset chain broke at doc ${b.getLong(0)}")
      case _ =>
    }
    assert(rows.head.getLong(4) == 0L)
    rows.foreach { r =>
      if (r.getBoolean(7)) // completion_split ⇒ the example itself spans
        assert(r.getLong(6) > r.getLong(5))
    }
  }

  test("best-of-n: the winner has the maximum reward and the margin is " +
    "positive vs the runner-up") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val sel = SparkEntry.queries("q219_best_of_n")(spark, sfDir)
      .limit(50).collect()
    sel.foreach { r =>
      val (docId, bestI, bestR, margin) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val rewards = (0 to 3).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$docId:$i".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        i -> java.lang.Long.parseLong(h, 16)
      }
      val sorted = rewards.sortBy { case (i, rw) => (-rw, i) }
      assert(sorted.head._1 == bestI && sorted.head._2 == bestR)
      // >= 0: two md5-derived 32-bit rewards for one doc can tie with
      // probability ~n_docs·6/2^32 — negligible but sf-dependent, and a
      // tie is a legitimate zero margin, not a kernel bug
      assert(margin == sorted.head._2 - sorted(1)._2 && margin >= 0)
    }
  }

  test("bitext margin mining: output is a partial matching (injective " +
    "both ways) and every pair beats both sides' alternatives on margin") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val m = SparkEntry.queries("q220_bitext_margin_mining")(spark, sfDir)
      .collect()
    assert(m.nonEmpty)
    assert(m.map(_.getLong(0)).distinct.length == m.length) // a_id unique
    assert(m.map(_.getLong(1)).distinct.length == m.length) // b_id unique
    assert(m.forall(r => r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1))
  }

  test("domain cap: caps at 10 per source, drops blocked sources, and " +
    "plans the rank filter as WindowGroupLimit") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val df = SparkEntry.queries("q221_domain_cap")(spark, sfDir)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 10))
    assert(!bySource.keySet.exists(Set("src17", "src18", "src19")))
    // the partial top-k must sit below the exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("streaming split routing equals its batch dual, and a matched " +
    "arrival never lands opposite its standing fingerprint-twin") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val routed = SparkEntry.queries("q224_stream_split_routing")(
      spark, sfDir).collect()
    // batch dual: q214 assignment over the standing half, joined to
    // the arriving half on the lead fingerprint
    val docs = spark.table("documents")
    def fp(c: org.apache.spark.sql.Column) =
      graft.operators.TextOps.leadFingerprint(c, 50)
    val standingSplit = SparkEntry.queries("q214_cluster_safe_split")(
        spark, sfDir) // full-corpus assignment; standing = even subset
    val evenSplit = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), fp(col("text")).as("fp"))
    val arriving = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), fp(col("text")).as("fp"))
    // every matched arrival shares a fingerprint with >=1 standing doc
    val matchedIds = routed.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val fpHits = arriving.join(evenSplit.select("fp").distinct(), "fp")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(matchedIds == fpHits)
    // output covers exactly the arriving half, split values legal
    assert(routed.length == arriving.count())
    assert(routed.map(_.getString(2)).toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("nDCG: bounded by 1, and equals 1 when the ranking IS the ideal " +
    "ranking") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val row = SparkEntry.queries("q216_ndcg")(spark, sfDir).collect().head
    val (dcg, idcg, ndcg) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(dcg > 0 && idcg >= dcg && ndcg > 0 && ndcg <= 1.0)
    // self-consistency: scoring the ideal ordering against itself is 1
    val rel = spark.table("documents").select(col("doc_id"), expr(
      """size(filter(array('hash','join','merge','filter'),
        |  t -> array_contains(split(trim(lower(text)), '\\s+'), t)))
        |""".stripMargin).cast("long").as("rel"))
    val ideal = rel.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rel").desc, col("doc_id"))))
      .where(col("rn") <= 10)
      .agg(sum((pow(lit(2.0), col("rel")) - 1.0) /
        log2(col("rn") + 1.0)).as("s"))
      .collect().head.getDouble(0)
    assert(math.abs(ideal - idcg) < 1e-4)
  }
}
