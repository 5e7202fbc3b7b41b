package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, frame sampling, and feature extraction.
  *
  * Image decode is REAL: [[decodeImageStats]] runs the JDK's builtin
  * `javax.imageio` PNG decoder (no external codec dependency) over
  * binary payloads and emits integer-exact pixel statistics — per-channel
  * sums and an 8-bin luma histogram — so results are bit-stable across
  * partitionings and oracle-checkable against an independently computed
  * expectation (tools/gen_media_fixture.py encodes the fixture PNGs in
  * pure Python; nothing JVM-side touches their production).
  *
  * Audio decode is REAL too: [[decodeWavStats]] walks RIFF/WAVE chunks
  * byte-by-byte (PCM16 — a container format, not a codec, so no
  * dependency is even needed) and emits integer-exact sample statistics
  * checked against tools/gen_audio_fixture.py's stdlib-`wave`-encoded
  * fixture.
  *
  * Video decode is REAL as well: [[decodeGifStats]]/[[gifFrameEmbedding]]
  * run the JDK's builtin multi-frame GIF reader frame-by-frame (the one
  * moving-picture format the JDK ships a codec for) and pool integer
  * statistics / per-frame features across frames, fixture-checked against
  * tools/gen_video_fixture.py's pure-Python GIF89a encoder.
  *
  * The byte-frame sampling path ([[sampleFrames]]/[[stubDecodeFeatures]])
  * models the codec-free frame shape: bounded deterministic frame slicing
  * with a pluggable per-frame kernel. Its default kernel is a
  * deterministic hash stand-in, kept because the plumbing — slicing,
  * pooling, batch shape — is reusable for formats the JVM cannot decode;
  * [[extractFeaturesVideo]] is the same pipeline with the real GIF codec
  * plugged into that seam.
  *
  * Scale notes: decode and all transforms are per-row work (no shuffle,
  * no driver collection); frame explosion is bounded by `maxFrames` so a
  * pathological 10 GB payload cannot blow up a task; features stay
  * fixed-width regardless of payload size.
  */
object MediaOps {

  /** Fixture location (same convention as GoldSuite's fixture root). */
  private val MediaFix = "/root/repo/fixtures/media"

  /** Integer-exact per-image statistics: width/height, per-channel sums,
    * 8-bin luma histogram (bin = ((r*299+g*587+b*114)/1000)/32, integer
    * division). Longs everywhere so schemas match the BIGINT oracle. */
  final case class ImageStats(width: Long, height: Long, sum_r: Long,
      sum_g: Long, sum_b: Long, h0: Long, h1: Long, h2: Long, h3: Long,
      h4: Long, h5: Long, h6: Long, h7: Long)

  /** Decodes one encoded image with the JDK ImageIO codec and computes
    * [[ImageStats]]. Integer math only — no float, so the result is
    * independent of evaluation order and identical on every platform. */
  def decodeImageStats(payload: Array[Byte]): ImageStats = {
    ImageIO.setUseCache(false) // in-memory decode; no temp-file cache
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff
        val g = (p >> 8) & 0xff
        val b = p & 0xff
        sr += r; sg += g; sb += b
        hist(((r * 299 + g * 587 + b * 114) / 1000) / 32) += 1L
        x += 1
      }
      y += 1
    }
    ImageStats(w, h, sr, sg, sb, hist(0), hist(1), hist(2), hist(3),
      hist(4), hist(5), hist(6), hist(7))
  }

  /** The image corpus: PNG payloads keyed by media_id, scoped to the
    * documents present in the bound sf (the fixture covers the superset).
    * At warehouse scale the media table IS the corpus and the semi-join
    * disappears; here it only selects the fixture slice. */
  def imageTable(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$MediaFix/pngs.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")

  /** Column-path image featurization: one decode per row via a scalar
    * UDF (decode is inherently black-box native work — a codec call is
    * the one place a UDF beats a Catalyst expression). */
  def imageFeatures(images: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeImageStats(b))
    images.select(col("media_id"), decodeUdf(col("png")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** Batched image featurization — the vectorized-codec call shape:
    * payloads cross the kernel boundary in `batchSize` groups per
    * partition (where a JNI/GPU decoder would amortize call overhead and
    * bound memory). Same per-image function as [[imageFeatures]], so the
    * two paths are bit-identical (proven in SystemOpsSpec). No shuffle:
    * mapPartitions preserves the scan partitioning. */
  def imageFeaturesBatched(images: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    // the id column rides through the kernel as-is (Row-encoded) so the
    // batched schema is identical to the Column path's — an unconditional
    // long cast would silently null non-numeric ids
    val in = images.select(col("media_id"), col("png"))
    val outSchema = StructType(
      in.schema.fields.head +: Encoders.product[ImageStats].schema.fields)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val stats = batch.map(r => decodeImageStats(r.getAs[Array[Byte]](1)))
        batch.iterator.zip(stats.iterator).map { case (r, s) =>
          Row.fromSeq(r.get(0) +: s.productIterator.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Decode + stride-2 top-left nearest-neighbor downsample + stats in
    * one pass: the resized image's pixel (X, Y) is the source's
    * (2X, 2Y), output dims are ceil(in/2) — a deterministic integer-
    * exact resize rule (no interpolation arithmetic to diverge across
    * platforms), shared verbatim with the fixture oracle
    * (tools/gen_media_fixture.py `pix[::2, ::2]`). The resized pixels
    * are never materialized — the stats accumulate directly off the
    * strided read, which is what a preprocessing pipeline fused to the
    * decoder would do at scale. */
  def decodeImageResizeStats(payload: Array[Byte]): ImageStats = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff
        val g = (p >> 8) & 0xff
        val b = p & 0xff
        sr += r; sg += g; sb += b
        hist(((r * 299 + g * 587 + b * 114) / 1000) / 32) += 1L
        x += 2
      }
      y += 2
    }
    ImageStats((w + 1) / 2, (h + 1) / 2, sr, sg, sb, hist(0), hist(1),
      hist(2), hist(3), hist(4), hist(5), hist(6), hist(7))
  }

  /** Column-path resize featurization — the third multimodal verb
    * (decode → RESIZE → feature-extract) with the same fixture-oracle
    * convention as [[imageFeatures]]. */
  def imageResizeFeatures(images: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeImageResizeStats(b))
    images.select(col("media_id"), decodeUdf(col("png")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** Difference-hash (dHash) of one encoded image — the standard
    * perceptual fingerprint for image near-dup dedup: 9×8 integer
    * nearest-neighbor downsample (x_i = i·w/9, y_j = j·h/8), integer
    * luma, bit j·8+i set iff luma(x_{i+1},y_j) > luma(x_i,y_j). All
    * integer math, so the hash is bit-identical across platforms and
    * matches tools/gen_dhash_fixture.py's raw-pixel-array computation
    * (a different stack — the fixture never touches the JVM decoder).
    * Robust to re-encoding and small edits; Hamming distance between
    * hashes is the near-dup metric (fed to the banded Hamming kernel,
    * q205). */
  def decodeImageDHash(payload: Array[Byte]): Long = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    def luma(x: Int, yy: Int): Int = {
      val p = img.getRGB(x, yy)
      (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
        (p & 0xff) * 114) / 1000
    }
    var out = 0L
    var j = 0
    while (j < 8) {
      val yj = j * h / 8
      var i = 0
      while (i < 8) {
        if (luma((i + 1) * w / 9, yj) > luma(i * w / 9, yj))
          out |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    out
  }

  /** Column-path dHash over an image table (media_id, png). */
  def imageDHash(images: DataFrame): DataFrame = {
    val u = udf((b: Array[Byte]) => decodeImageDHash(b))
    images.select(col("media_id"), u(col("png")).as("dhash"))
  }

  /** The image corpus as individual FILES read through Spark's
    * `binaryFile` source — the real ingestion path for media sitting on
    * a filesystem/object store (one row per file: path, length,
    * modificationTime, content), where [[imageTable]]'s parquet BLOB
    * column is the post-ingest warehouse form. The file tree is
    * materialized once per JVM from the fixture (harness scaffolding —
    * in production the files simply exist); the read itself is the
    * operator under test: binaryFile splits by file across the cluster,
    * `pathGlobFilter` prunes non-PNGs at listing time, and media_id is
    * recovered from the file name. */
  def imageFilesTable(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(dir)
    // The ready-marker is keyed on a fingerprint of the fixture
    // (per-file name/size/mtime): regenerating pngs.parquet changes
    // the fingerprint, so a stale tree from a prior run is rebuilt
    // instead of silently feeding old bytes. Cross-process safety
    // comes from staging + atomic rename: the tree is built complete
    // (marker included) in a run-unique sibling dir, the stale tree is
    // moved aside, and one directory rename publishes the new one —
    // another process never observes a partial tree, and losing the
    // swap race just drops a byte-identical staging copy (the tree is
    // deterministic from the fixture).
    val fp = fixtureFingerprint(
      java.nio.file.Paths.get(s"$MediaFix/pngs.parquet"))
    val marker = root.resolve(s"_graft_files_ready_$fp")
    filesOnce.computeIfAbsent(s"$dir#$fp", _ => {
      if (!java.nio.file.Files.exists(marker)) {
        val staging = root.resolveSibling(
          s"${root.getFileName}.tmp-${graft.SystemQueries.runToken}")
        deleteTree(staging)
        java.nio.file.Files.createDirectories(staging)
        spark.read.parquet(s"$MediaFix/pngs.parquet").collect().foreach {
          r =>
            java.nio.file.Files.write(
              staging.resolve(f"${r.getLong(0)}%05d.png"),
              r.getAs[Array[Byte]](1))
        }
        java.nio.file.Files.write(staging.resolve(marker.getFileName),
          Array.emptyByteArray)
        val aside = root.resolveSibling(
          s"${root.getFileName}.old-${graft.SystemQueries.runToken}")
        try {
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.move(root, aside,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } catch { case _: java.io.IOException => () }
        try java.nio.file.Files.move(staging, root,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.io.IOException => deleteTree(staging) }
        deleteTree(aside)
      }
      java.lang.Boolean.TRUE
    })
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.png$", 1).cast("long")
          .as("media_id"),
        col("content").as("png"))
  }
  private val filesOnce =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Order-independent fingerprint of a fixture file/tree: sorted
    * relative names folded with per-file size and mtime. Cheap (stat
    * only, no content read) yet changes whenever the fixture is
    * regenerated. */
  private def fixtureFingerprint(p: java.nio.file.Path): String = {
    if (!java.nio.file.Files.exists(p)) return "absent"
    val s = java.nio.file.Files.walk(p)
    try {
      val files = scala.jdk.CollectionConverters
        .IteratorHasAsScala(s.iterator()).asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .toSeq.sortBy(_.toString)
      var h = 1125899906842597L
      files.foreach { f =>
        h = h * 31 + p.relativize(f).toString.hashCode
        h = h * 31 + java.nio.file.Files.size(f)
        h = h * 31 + java.nio.file.Files.getLastModifiedTime(f).toMillis
      }
      java.lang.Long.toHexString(h)
    } finally s.close()
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val f = p.toFile
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(c => deleteTree(c.toPath))
    f.delete(): Unit
  }

  /** Integer-exact per-clip audio statistics (see
    * tools/gen_audio_fixture.py for the shared definitions). Longs
    * everywhere so schemas match the BIGINT oracle. */
  final case class AudioStats(n_frames: Long, sample_rate: Long,
      channels: Long, sum_abs: Long, peak: Long, energy: Long,
      zero_cross: Long)

  /** Decodes one RIFF/WAVE payload (PCM, 16-bit) with a pure byte-level
    * chunk walk — no codec dependency at all — and computes
    * [[AudioStats]]. Chunk sizes are word-aligned per the RIFF spec.
    * Integer math only, so results are platform- and order-independent.
    *
    * zero_cross counts strict sign changes ((s[i-1] < 0) != (s[i] < 0))
    * over channel 0 — the exact convention the fixture oracle uses. */
  def decodeWavStats(payload: Array[Byte]): AudioStats =
    decodeWavStatsStrided(payload, 1)

  /** Decode + decimate-by-`stride` in one pass: keeps every `stride`-th
    * frame (all channels) and divides the declared sample rate by the
    * stride (integer division) — the deterministic integer-exact
    * resample rule (no filter/interpolation arithmetic to drift), shared
    * verbatim with the fixture oracle (tools/gen_audio_fixture.py
    * `samples[::2]`). Decimated frames are never materialized; the
    * stats accumulate directly off the strided read, mirroring
    * [[decodeImageResizeStats]]. zero_cross compares consecutive KEPT
    * channel-0 samples. */
  def decodeWavResampleStats(payload: Array[Byte]): AudioStats =
    decodeWavStatsStrided(payload, 2)

  /** Parsed PCM16 layout of a RIFF/WAVE payload: (channels,
    * sampleRate, dataOff, nFrames). All the defensive chunk-walk
    * checks live here, shared by the stats and fingerprint decoders. */
  private def wavPcmLayout(payload: Array[Byte]): (Int, Int, Int, Int) = {
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    def tag(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "payload is not a RIFF/WAVE file")
    // the walk offset is a Long: RIFF sizes are unsigned 32-bit, and a
    // crafted size near 2^31 would wrap an Int offset negative and turn
    // the intended require() failures into raw IndexOutOfBounds
    var off = 12L
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1L; var dataLen = 0L
    while (off + 8 <= payload.length) {
      val o = off.toInt // off + 8 <= length, so the header fits in Int
      val id = tag(o)
      val sz = le32(o + 4) & 0xffffffffL // unsigned per the RIFF spec
      // every declared chunk must fit the payload — a truncated or
      // crafted file fails HERE with a clear message, before any field
      // read can run off the end of the array
      require(off + 8 + sz <= payload.length,
        s"corrupt chunk '$id': declared size $sz exceeds payload")
      if (id == "fmt ") {
        // the PCM fmt fields span 16 bytes; reading them from a
        // shorter chunk would alias the next chunk's header
        require(sz >= 16, s"corrupt fmt chunk: size $sz < 16")
        require(le16(o + 8) == 1, "only PCM (format 1) supported")
        channels = le16(o + 10)
        sampleRate = le32(o + 12)
        bits = le16(o + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(bits == 16, s"only 16-bit PCM supported, got $bits")
    require(dataOff >= 0 && channels > 0, "missing data or fmt chunk")
    val nFrames = (dataLen / (2 * channels)).toInt
    (channels, sampleRate, dataOff.toInt, nFrames)
  }

  private def decodeWavStatsStrided(payload: Array[Byte],
      stride: Int): AudioStats = {
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val (channels, sampleRate, dOff, nFrames) = wavPcmLayout(payload)
    var sumAbs = 0L; var peak = 0L; var energy = 0L; var zc = 0L
    var prevNeg = false
    var kept = 0L
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val s = le16(dOff + 2 * (i * channels + c)).toShort.toLong
        val a = math.abs(s)
        sumAbs += a; energy += s * s
        if (a > peak) peak = a
        if (c == 0) {
          val neg = s < 0
          if (kept > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
        }
        c += 1
      }
      kept += 1
      i += stride
    }
    AudioStats(kept, sampleRate / stride, channels, sumAbs, peak, energy,
      zc)
  }

  /** Temporal energy-delta fingerprint of one WAV clip — the audio
    * analogue of [[decodeImageDHash]] (a Shazam-style descriptor
    * simplified to one band): channel 0 splits into 65 equal time bins
    * (bin b covers frames [b·n/65, (b+1)·n/65), integer division),
    * bin energy is the exact Σs² (long), and bit b (0..63) is set iff
    * energy(b+1) > energy(b). All integer math — bit-identical across
    * platforms and equal to tools/gen_audio_fp_fixture.py's raw-sample
    * computation (stdlib-`wave`-encoded fixture, so decode+hash is
    * cross-stack). Robust to amplitude/phase nudges, which only flip
    * near-tie comparisons; Hamming distance is the near-dup metric
    * (fed to the banded kernel, q207). */
  def decodeAudioFingerprint(payload: Array[Byte]): Long = {
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val (channels, _, dOff, nFrames) = wavPcmLayout(payload)
    val energies = new Array[Long](65)
    var b = 0
    while (b < 65) {
      var i = b * nFrames / 65
      val end = (b + 1) * nFrames / 65
      while (i < end) {
        val s = le16(dOff + 2 * i * channels).toShort.toLong
        energies(b) += s * s
        i += 1
      }
      b += 1
    }
    var out = 0L
    b = 0
    while (b < 64) {
      if (energies(b + 1) > energies(b)) out |= 1L << b
      b += 1
    }
    out
  }

  /** Column-path audio fingerprinting over an audio table
    * (media_id, wav). */
  def audioFingerprint(audio: DataFrame): DataFrame = {
    val u = udf((b: Array[Byte]) => decodeAudioFingerprint(b))
    audio.select(col("media_id"), u(col("wav")).as("afp"))
  }

  /** The audio corpus: WAV payloads keyed by media_id, scoped to the
    * documents present in the bound sf (same fixture convention as
    * [[imageTable]]). */
  def audioTable(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$MediaFix/wavs.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")

  /** Column-path audio featurization: one decode per row via a scalar
    * UDF (same rationale as [[imageFeatures]]). */
  def audioFeatures(audio: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeWavStats(b))
    audio.select(col("media_id"), decodeUdf(col("wav")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** Column-path resample featurization — audio's decimation sibling of
    * [[imageResizeFeatures]], same fixture-oracle convention. */
  def audioResampleFeatures(audio: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeWavResampleStats(b))
    audio.select(col("media_id"), decodeUdf(col("wav")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** Batched audio featurization — the vectorized-codec call shape,
    * mirroring [[imageFeaturesBatched]]: same per-clip function, so the
    * two paths are bit-identical; no shuffle. */
  def audioFeaturesBatched(audio: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    // same Row-encoded id pass-through as [[imageFeaturesBatched]]
    val in = audio.select(col("media_id"), col("wav"))
    val outSchema = StructType(
      in.schema.fields.head +: Encoders.product[AudioStats].schema.fields)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val stats = batch.map(r => decodeWavStats(r.getAs[Array[Byte]](1)))
        batch.iterator.zip(stats.iterator).map { case (r, s) =>
          Row.fromSeq(r.get(0) +: s.productIterator.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Integer-exact per-clip video statistics, pooled over all frames
    * (see tools/gen_video_fixture.py for the shared definitions). Longs
    * everywhere so schemas match the BIGINT oracle. */
  final case class VideoStats(n_frames: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, h0: Long, h1: Long, h2: Long,
      h3: Long, h4: Long, h5: Long, h6: Long, h7: Long)

  /** Decodes one multi-frame GIF clip with the JDK's builtin
    * `javax.imageio` GIF reader — REAL frame-by-frame video decode, no
    * external codec dependency — and pools [[ImageStats]]-style integer
    * statistics over every frame. Integer math only, so the result is
    * independent of evaluation order and identical on every platform.
    * The fixture's frames are full-size with no transparency, so each
    * `reader.read(i)` is a complete frame (no disposal compositing
    * needed — a general GIF player would composite here). */
  def decodeGifStats(payload: Array[Byte]): VideoStats = {
    ImageIO.setUseCache(false) // in-memory decode; no temp-file cache
    val readers = ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "JDK GIF reader missing")
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true) // count frames (full scan)
      require(n > 0, "payload is not a decodable GIF")
      var w = 0L; var h = 0L
      var sr = 0L; var sg = 0L; var sb = 0L
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        val img = reader.read(i)
        if (i == 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
        else require(img.getWidth == w && img.getHeight == h,
          "frames must share the clip's dimensions")
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            sr += r; sg += g; sb += b
            hist(((r * 299 + g * 587 + b * 114) / 1000) / 32) += 1L
            x += 1
          }
          y += 1
        }
        i += 1
      }
      VideoStats(n, w, h, sr, sg, sb, hist(0), hist(1), hist(2), hist(3),
        hist(4), hist(5), hist(6), hist(7))
    } finally { reader.dispose(); iis.close() }
  }

  /** REAL per-frame feature kernel over a GIF clip: the clip-pooled
    * [[featureDim]]-bin luma histogram as fractions of total pixels
    * (frames share the clip's dimensions — enforced — so this equals the
    * mean of per-frame fractions), rounded with DuckDB's rounding rule.
    * One integer-exact accumulation + ONE double division per bin keeps
    * the unrounded double bit-identical to an oracle computing
    * `h / (n_frames·w·h)` from the same integer stats — no accumulated
    * float drift to straddle a rounding boundary. Returns (n_frames,
    * pooled embedding). */
  def gifFrameEmbedding(payload: Array[Byte]): (Int, Array[Double]) = {
    val s = decodeGifStats(payload)
    val px = (s.n_frames * s.width * s.height).toDouble
    val hist = Array(s.h0, s.h1, s.h2, s.h3, s.h4, s.h5, s.h6, s.h7)
    (s.n_frames.toInt,
      hist.map(h => graft.functions.GraftVector.duckRound(h / px, 6)))
  }

  /** Per-clip scene-change detection over REAL JDK GIF frame decode:
    * a scene boundary sits before frame f when the mean-luma shift
    * |Σluma_f − Σluma_{f−1}| clears `thresholdPerPx` per pixel —
    * integer arithmetic throughout (the comparison is against
    * threshold·w·h, never a float mean). Per-frame luma is the sum of
    * per-PIXEL integer lumas (BT.601 weighted sum, truncated /1000 per
    * pixel), so the definition is palette-independent; on a grayscale
    * palette it is exact (luma(v,v,v) = v). Returns frame count, scene
    * count (1 + boundaries), a bitmask of boundary frames (bit f set =
    * a cut before frame f) and the total luma sum (ties the decode to
    * the pooled-stats kernel). The fixture's frames follow an analytic
    * pixel law, so the oracle re-derives every per-frame luma sum in
    * SQL from the generative formula — decode and detection are
    * cross-stack checked without a per-frame fixture column. */
  final case class SceneStats(n_frames: Long, n_scenes: Long,
      boundaries_mask: Long, total_luma: Long)

  def decodeGifScenes(payload: Array[Byte],
      thresholdPerPx: Long = 16L): SceneStats = {
    ImageIO.setUseCache(false)
    val readers = ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "JDK GIF reader missing")
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n > 0, "payload is not a decodable GIF")
      var w = 0L; var h = 0L
      var prev = 0L; var total = 0L
      var scenes = 1L; var mask = 0L
      var i = 0
      while (i < n) {
        val img = reader.read(i)
        if (i == 0) { w = img.getWidth.toLong; h = img.getHeight.toLong }
        else require(img.getWidth == w && img.getHeight == h,
          "frames must share the clip's dimensions")
        var sl = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            // per-pixel integer luma (ITU-R BT.601 weights /1000): the
            // truncation happens per PIXEL, so the semantics are
            // palette-independent — on a grayscale palette this is
            // exact, luma(v,v,v) = (299+587+114)v/1000 = v
            sl += (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
              (p & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        if (i > 0 && math.abs(sl - prev) >= thresholdPerPx * w * h) {
          scenes += 1; mask |= 1L << i
        }
        prev = sl
        total += sl
        i += 1
      }
      SceneStats(n, scenes, mask, total)
    } finally { reader.dispose(); iis.close() }
  }

  def videoScenes(video: DataFrame, thresholdPerPx: Long = 16L)
      : DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeGifScenes(b, thresholdPerPx))
    video.select(col("media_id"), decodeUdf(col("gif")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** The video corpus: multi-frame GIF payloads keyed by media_id,
    * scoped to the documents present in the bound sf (same fixture
    * convention as [[imageTable]]). */
  def videoTable(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$MediaFix/gifs.parquet")
      .join(broadcast(spark.table("documents").select(col("doc_id"))),
        col("media_id") === col("doc_id"), "leftsemi")

  /** Column-path video featurization: one multi-frame decode per row via
    * a scalar UDF (same rationale as [[imageFeatures]]). */
  def videoFeatures(video: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => decodeGifStats(b))
    video.select(col("media_id"), decodeUdf(col("gif")).as("s"))
      .select(col("media_id"), col("s.*"))
  }

  /** Batched video featurization — the vectorized-codec call shape,
    * mirroring [[imageFeaturesBatched]]: same per-clip function, so the
    * two paths are bit-identical; no shuffle. */
  def videoFeaturesBatched(video: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    // same Row-encoded id pass-through as [[imageFeaturesBatched]]
    val in = video.select(col("media_id"), col("gif"))
    val outSchema = StructType(
      in.schema.fields.head +: Encoders.product[VideoStats].schema.fields)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val stats = batch.map(r => decodeGifStats(r.getAs[Array[Byte]](1)))
        batch.iterator.zip(stats.iterator).map { case (r, s) =>
          Row.fromSeq(r.get(0) +: s.productIterator.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** End-to-end video featurization with the REAL codec: GIF frames →
    * per-frame luma-histogram features → mean-pooled embedding + frame
    * count. Same output shape as [[extractFeaturesBatched]], with
    * [[gifFrameEmbedding]] in place of the hash stub — the "replace with
    * a real codec" seam, exercised. */
  def extractFeaturesVideo(video: DataFrame, batchSize: Int = 32)
      : DataFrame = {
    val in = video.select(col("media_id"), col("gif"))
    val outSchema = StructType(Seq(in.schema.fields.head,
      StructField("n_frames", IntegerType, nullable = false),
      StructField("embedding",
        ArrayType(DoubleType, containsNull = false), nullable = true)))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = batch.map(r => gifFrameEmbedding(r.getAs[Array[Byte]](1)))
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row(r.get(0), f._1, f._2)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Synthesizes a media table from the documents fixture: payload =
    * utf-8 bytes standing in for an encoded image/audio blob, plus the
    * typed metadata struct a real ingest would carry. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("stub/raw").as("format"),
        col("n_chars").cast("long").as("size_bytes"),
        (col("doc_id") % 3 + 1).cast("int").as("channels")).as("meta"))

  /** Samples fixed-length byte frames every `stride` bytes (video
    * frame-sampling shape: bounded count, deterministic positions). */
  def sampleFrames(payload: Column, frameLen: Int, stride: Int,
      maxFrames: Int): Column =
    transform(
      slice(sequence(lit(1),
        greatest(length(payload) - (frameLen - 1), lit(1)), lit(stride)),
        1, maxFrames),
      i => payload.substr(i, lit(frameLen)))

  /** Per-frame feature width — ONE constant shared by the decoder and
    * the pooler: a real decoder emitting a different width must change
    * it here, or element_at in meanPool would fail (narrower) or
    * silently truncate (wider). */
  val featureDim: Int = 8

  /** STUB decoder: [[featureDim]] pseudo-features per frame derived from
    * seeded hashes of the frame bytes. Replace with a real codec for
    * production. */
  def stubDecodeFeatures(frame: Column): Column =
    transform(sequence(lit(0), lit(featureDim - 1)),
      j => (pmod(xxhash64(frame, j), lit(1000)).cast("double") / 1000.0))

  /** Mean-pools per-frame feature vectors into one fixed-width vector. */
  def meanPool(features: Column): Column = {
    val n = greatest(size(features), lit(1)).cast("double")
    transform(sequence(lit(1), lit(featureDim)),
      i => round(aggregate(features, lit(0.0),
        (acc, f) => acc + element_at(f, i)) / n, 6))
  }

  /** End-to-end media featurization: payload → frames → (stub) decode →
    * mean-pooled embedding + frame count. */
  def extractFeatures(media: DataFrame, frameLen: Int = 64,
      stride: Int = 48, maxFrames: Int = 16): DataFrame = {
    val frames = sampleFrames(col("payload"), frameLen, stride, maxFrames)
    val feats = transform(frames, f => stubDecodeFeatures(f))
    media.select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.channels").as("channels"),
      size(frames).as("n_frames"),
      meanPool(feats).as("embedding"))
  }

  /** Batched decode path — the shape of a real vectorized codec call
    * (the Scala analogue of `mapInPandas`): payloads cross the kernel
    * boundary in fixed-size batches per partition, so a JNI/native
    * decoder amortizes its call overhead and bounds its memory to
    * `batchSize` payloads. The kernel here is the SAME stub feature
    * formula as [[stubDecodeFeatures]] (bit-identical output, proven in
    * MediaOps specs), so swapping in a real codec changes exactly one
    * function. No shuffle: mapPartitions preserves the scan
    * partitioning; output is fixed-width regardless of payload size. */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 32,
      frameLen: Int = 64, stride: Int = 48, maxFrames: Int = 16)
      : DataFrame = {
    // same Row-encoded id pass-through as [[imageFeaturesBatched]]
    val in = media.select(col("media_id"), col("payload"))
    val outSchema = StructType(Seq(in.schema.fields.head,
      StructField("n_frames", IntegerType, nullable = false),
      StructField("embedding",
        ArrayType(DoubleType, containsNull = false), nullable = true)))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one kernel call per batch — where a vectorized decoder runs
        val feats = stubKernelBatch(
          batch.map(_.getAs[Array[Byte]](1)), frameLen, stride, maxFrames)
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row(r.get(0), f._1, f._2)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** JVM stub kernel: per payload, the same frames → xxhash features →
    * mean-pool → round(6) pipeline as the Column path (Spark's
    * `xxhash64(frame, j)` = XXH64 over frame bytes at seed 42, then over
    * the int j at the previous hash as seed). */
  private def stubKernelBatch(payloads: Seq[Array[Byte]], frameLen: Int,
      stride: Int, maxFrames: Int): Seq[(Int, Array[Double])] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{BinaryType, IntegerType}
    payloads.map { p =>
      val end = math.max(p.length - (frameLen - 1), 1)
      val starts = Range.inclusive(1, end, stride).take(maxFrames)
      val frames = starts.map(s => p.slice(s - 1, s - 1 + frameLen))
      val feats = frames.map { f =>
        Array.tabulate(featureDim) { j =>
          val h = XxHash64Function.hash(j,
            IntegerType, XxHash64Function.hash(f, BinaryType, 42L))
          (((h % 1000) + 1000) % 1000).toDouble / 1000.0
        }
      }
      val n = math.max(frames.size, 1)
      val pooled = Array.tabulate(featureDim) { j =>
        BigDecimal(feats.map(_(j)).sum / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      (frames.size, pooled)
    }
  }
}
