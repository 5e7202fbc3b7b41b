package graft.functions

/** CPython-compatible Mersenne Twister, sufficient to reproduce
  * `random.Random(seed).shuffle(xs)` bit-for-bit.
  *
  * Why this exists: the reference's prompt formatter shuffles table
  * order before memoizing it (prompt_formatters.py:39,
  * `random.shuffle(table_texts)`), using CPython's module-level MT19937.
  * PromptOps is deterministic by default (reproducibility rule), but a
  * user replaying a reference run that seeded the RNG needs the SAME
  * permutation — so the shuffle semantics must match CPython exactly:
  * MT19937 seeded via init_by_array over the integer's 32-bit
  * little-endian words, `_randbelow` by rejection over `getrandbits
  * (bitlen)`, Fisher–Yates from the top (Lib/random.py `shuffle`).
  *
  * Verified against CPython fixtures in PromptOpsSpec (getrandbits
  * streams and shuffle orders for five seeds).
  *
  * Not a parallel primitive: prompt-table lists are model-sized (tens of
  * entries), so the shuffle runs once on the driver and the resulting
  * order is folded into the codegen'd prompt-concat literal exactly like
  * the unshuffled path.
  */
final class PyRandom(seed: Long) {
  private val mt = new Array[Int](624)
  private var mti = 625

  initByArray(seedWords(seed))

  private def seedWords(n: Long): Array[Int] = {
    val v = if (n < 0) -n else n // CPython seeds with abs(int)
    if (v == 0) Array(0)
    else if ((v >>> 32) == 0) Array(v.toInt)
    else Array(v.toInt, (v >>> 32).toInt)
  }

  private def initGenrand(s: Int): Unit = {
    mt(0) = s
    var i = 1
    while (i < 624) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
    mti = 624
  }

  private def initByArray(key: Array[Int]): Unit = {
    initGenrand(19650218)
    var i = 1; var j = 0
    var k = math.max(624, key.length)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) +
        key(j) + j
      i += 1; j += 1
      if (i >= 624) { mt(0) = mt(623); i = 1 }
      if (j >= key.length) j = 0
      k -= 1
    }
    k = 623
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
      i += 1
      if (i >= 624) { mt(0) = mt(623); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000
  }

  /** One tempered 32-bit output (genrand_uint32), as an unsigned Long. */
  def nextUInt32(): Long = {
    if (mti >= 624) {
      var kk = 0
      while (kk < 624 - 397) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < 623) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + (397 - 624)) ^ (y >>> 1) ^
          (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(623) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(623) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti); mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  /** random.getrandbits(k) for 0 < k <= 32 (list sizes never need more). */
  def getrandbits(k: Int): Long = {
    require(k > 0 && k <= 32, s"getrandbits($k) out of supported range")
    nextUInt32() >>> (32 - k)
  }

  /** random._randbelow_with_getrandbits(n): rejection over bitlen(n). */
  def randbelow(n: Int): Int = {
    require(n > 0)
    val k = 32 - Integer.numberOfLeadingZeros(n)
    var r = getrandbits(k)
    while (r >= n) r = getrandbits(k)
    r.toInt
  }

  /** random.shuffle semantics: Fisher–Yates from the last index down. */
  def shuffle[T](xs: Seq[T]): Seq[T] = {
    val a = xs.toBuffer
    var i = a.length - 1
    while (i > 0) {
      val j = randbelow(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a.toSeq
  }
}
