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
}
