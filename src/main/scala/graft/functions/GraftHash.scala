package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels invoked from codegen via `StaticInvoke` — one fused pass
  * per row instead of the O(bits × tokens) nested higher-order-function
  * expansion the same logic would cost in SQL. Deterministic (seeded
  * xxHash64 / splitmix64), so results are stable across runs, partitions
  * and cluster sizes.
  */
object GraftHash {

  /** 64-bit SimHash over a token array: per-bit majority vote of the
    * tokens' xxHash64 bits. Near-identical token multisets → small Hamming
    * distance. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** MinHash signature: k per-seed minima of xxHash64 over the shingle
    * set, computed in ONE pass over the shingles (the equivalent nested
    * higher-order-function formulation is interpreted and allocates a
    * fresh k-array per shingle — ~50× slower at corpus scale). */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s: UTF8String = shingles.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Portable MinHash signature: position j is the minimum over the
    * shingle set of the first 48 bits of md5("j|shingle"). The md5
    * discipline (same as [[simhashMd5]]) makes every position
    * reproducible in any SQL engine as
    * `min(('0x' || substring(md5(j || '|' || s), 1, 12))::BIGINT)` —
    * so MinHash-banded operators can be oracle-checked value-for-value,
    * not just rows-only. k digests per shingle, one pass; an empty or
    * all-null shingle set yields Long.MaxValue positions (the neutral
    * min element, matching SQL `min()` over zero rows being absorbed by
    * a COALESCE upper bound). */
  def minhashMd5Sig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).toString
        var j = 0
        while (j < k) {
          md.reset()
          val d = md.digest((j.toString + "|" + s)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v = 0L
          var b = 0
          while (b < 6) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Portable 32-bit SimHash: bit j is the majority vote of the MSB of
    * hex nibble j of each token's md5. Unlike [[simhash64]] (xxHash64,
    * engine-internal), every SQL engine with `md5()` + `substr()` can
    * reproduce this bit-for-bit — so the operator is oracle-checkable
    * end-to-end, not just rows-only. One digest per token, one pass. */
  def simhashMd5(tokens: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < 32) {
          val b = digest(j / 2)
          val nibble = if (j % 2 == 0) (b >> 4) & 0xF else b & 0xF
          if ((nibble & 0x8) != 0) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Random-hyperplane (sign) sketch of a float vector: `bits` Rademacher
    * (±1-entry) hyperplanes derived from `seed`; bit j = sign of the dot
    * product with plane j. Collision probability of two vectors on one bit
    * is 1 - θ/π (θ = angle), the classic cosine-LSH family. */
  def rpSketch(vec: ArrayData, bits: Int, seed: Long): Long = {
    val d = vec.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val r = splitmix64(seed + j.toLong * d + i)
        val sign = if ((r & 1L) == 1L) 1.0 else -1.0
        dot += vec.getFloat(i) * sign
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Multi-probe bucket sequence for [[rpSketch]] (Lv et al. 2007,
    * VLDB — "Multi-Probe LSH", restricted to Hamming-1 perturbations):
    * the vector's own bucket first, then buckets obtained by flipping
    * one sketch bit in increasing order of |projection margin| — the
    * bits most likely to have landed on the wrong side of their
    * hyperplane for the vector's true neighbors. Probing `probes`
    * buckets multiplies candidates by at most `probes` while recovering
    * most of the recall lost to boundary effects, WITHOUT growing the
    * corpus index (only the query side fans out). */
  def rpSketchProbes(vec: ArrayData, bits: Int, seed: Long,
      probes: Int): ArrayData = {
    val d = vec.numElements()
    val dots = new Array[Double](bits)
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val r = splitmix64(seed + j.toLong * d + i)
        val sign = if ((r & 1L) == 1L) 1.0 else -1.0
        dot += vec.getFloat(i) * sign
        i += 1
      }
      dots(j) = dot
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    val order = Array.range(0, bits).sortBy(b => math.abs(dots(b)))
    val n = math.max(1, math.min(probes, bits + 1))
    val out = new Array[Long](n)
    out(0) = sig
    var i = 1
    while (i < n) { out(i) = sig ^ (1L << order(i - 1)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
