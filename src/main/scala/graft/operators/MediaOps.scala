package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, frame sampling, and feature extraction.
  *
  * The decode step is a clearly-marked STUB (this environment has no
  * image/audio codecs): [[stubDecodeFeatures]] derives a deterministic
  * fake feature vector from the frame bytes. A real deployment swaps only
  * that one Column expression for a native decoder (or a mapPartitions
  * batch over a JNI codec); everything around it — the binary schema, the
  * frame slicing, the per-frame feature shape, pooling, partitioning — is
  * real and tested.
  *
  * Scale notes: all transforms are per-row Column algebra over the binary
  * payload (no shuffle, no driver collection); frame explosion is bounded
  * by `maxFrames` so a pathological 10 GB payload cannot blow up a task;
  * pooled features stay fixed-width regardless of payload size.
  */
object MediaOps {

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
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one kernel call per batch — where a vectorized decoder runs
          val feats = stubKernelBatch(batch.map(_._2),
            frameLen, stride, maxFrames)
          batch.iterator.zip(feats.iterator).map { case ((id, _), f) =>
            (id, f._1, f._2)
          }
        }
      }
      .toDF("media_id", "n_frames", "embedding")
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
