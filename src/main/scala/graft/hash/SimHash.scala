package graft.hash

/** 64-bit SimHash over a document's shingle strings (the BASELINE north_rule
  * "SimHash variant" channel — no reference parity target; standard Charikar
  * construction). Each shingle contributes a 64-bit hash built from two
  * independent mmh3 passes (seeds 0 and 1); bit-majority voting yields the
  * fingerprint. Near-duplicates differ in few bits → candidate generation by
  * exact match on 4×16-bit chunks (its own banding).
  */
object SimHash {
  def of(shingles: IterableOnce[String]): Long = {
    val votes = new Array[Int](64)
    var n = 0
    val it = shingles.iterator
    while (it.hasNext) {
      val s = it.next()
      val h = hash64(s)
      var b = 0
      while (b < 64) { // branchless vote — see ofHashes
        votes(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
        b += 1
      }
      n += 1
    }
    if (n == 0) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Spread table for the SWAR vote: SpreadBits(v) places bit j of the byte
    * v into byte lane j of a long, so adding it to an accumulator counts 8
    * bit-positions at once (each lane saturates at 255 — flushed before).
    */
  private val SpreadBits: Array[Long] = Array.tabulate(256) { v =>
    var out = 0L
    var j = 0
    while (j < 8) { if (((v >> j) & 1) != 0) out |= 1L << (8 * j); j += 1 }
    out
  }

  /** SimHash from pre-hashed 32-bit shingle values: each is avalanched to
    * 64 bits with the splitmix64 finalizer (saves re-hashing the shingle
    * strings when a MinHash pass already produced their mmh3 values).
    *
    * SWAR voting: instead of 64 per-bit adds per hash (the branchless form
    * — itself 2× the branchy one), 8 byte-packed accumulators count 8 bit
    * positions each via a 256-entry spread table — 8 shifts+adds per hash.
    * Lanes hold set-bit COUNTS (≤ 255, flushed every 255 hashes into full
    * ints); bit b of the output is set iff 2·set(b) > n, which is exactly
    * the old ±1 vote's `votes(b) = 2·set(b) − n > 0`. Verified equivalent
    * against the per-bit reference on random and adversarial inputs
    * (SimHashSpec).
    */
  def ofHashes(hs: Array[Long]): Long = {
    if (hs.isEmpty) return 0L
    val set = new Array[Int](64)
    val n = hs.length
    var i = 0
    while (i < n) {
      val end = math.min(i + 255, n)
      var a0 = 0L; var a1 = 0L; var a2 = 0L; var a3 = 0L
      var a4 = 0L; var a5 = 0L; var a6 = 0L; var a7 = 0L
      while (i < end) {
        val h = mix64(hs(i))
        a0 += SpreadBits((h & 0xffL).toInt)
        a1 += SpreadBits(((h >>> 8) & 0xffL).toInt)
        a2 += SpreadBits(((h >>> 16) & 0xffL).toInt)
        a3 += SpreadBits(((h >>> 24) & 0xffL).toInt)
        a4 += SpreadBits(((h >>> 32) & 0xffL).toInt)
        a5 += SpreadBits(((h >>> 40) & 0xffL).toInt)
        a6 += SpreadBits(((h >>> 48) & 0xffL).toInt)
        a7 += SpreadBits(((h >>> 56) & 0xffL).toInt)
        i += 1
      }
      var g = 0
      while (g < 8) {
        val acc = g match {
          case 0 => a0; case 1 => a1; case 2 => a2; case 3 => a3
          case 4 => a4; case 5 => a5; case 6 => a6; case _ => a7
        }
        var j = 0
        while (j < 8) {
          set(8 * g + j) += ((acc >>> (8 * j)) & 0xffL).toInt
          j += 1
        }
        g += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (2 * set(b) > n) out |= (1L << b); b += 1 }
    out
  }

  /** splitmix64 finalizer (public domain constant mix). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hash64(s: String): Long =
    hash64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** `hash64` over pre-built UTF-8 bytes (`[0, len)` of `b`) — UTF-8 is
    * concatenative per code point, so callers can assemble the bytes of a
    * joined string from cached per-token bytes without materializing the
    * String (the kernel's exact-hash path does).
    */
  def hash64Bytes(b: Array[Byte], len: Int = -1): Long = {
    val n = if (len < 0) b.length else len
    val lo = Murmur3.hashBytes(b, 0, n, 0).toLong & 0xffffffffL
    val hi = Murmur3.hashBytes(b, 0, n, 1).toLong & 0xffffffffL
    lo | (hi << 32)
  }

  /** Second independent 64-bit hash (mmh3 seeds 2,3) — paired with `hash64`
    * this forms the 128-bit content identity used by the exact-dup channel:
    * a single 64-bit hash at the 10^12-doc design scale expects ~27k
    * birthday collisions, i.e. silent false exact merges.
    */
  def hash64b(s: String): Long =
    hash64bBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** `hash64b` over pre-built UTF-8 bytes (`[0, len)` of `b`). */
  def hash64bBytes(b: Array[Byte], len: Int = -1): Long = {
    val n = if (len < 0) b.length else len
    val lo = Murmur3.hashBytes(b, 0, n, 2).toLong & 0xffffffffL
    val hi = Murmur3.hashBytes(b, 0, n, 3).toLong & 0xffffffffL
    lo | (hi << 32)
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 4×16-bit chunks for Hamming-ball candidate banding. */
  def chunks16(v: Long): Array[Int] =
    Array.tabulate(4)(i => ((v >>> (16 * i)) & 0xffffL).toInt)

  /** Hamming-ball banding keys with a tunable guarantee: split the 64-bit
    * value into `blocks` equal-ish chunks and emit one key per
    * C(blocks, keep) chunk combination (chunk values concatenated, tagged
    * with the combination index). Any two values within Hamming distance
    * `blocks - keep` share at least one key (≤ blocks-keep flips leave ≥ keep
    * chunks intact — some kept combination is fully intact). Wider keys
    * (higher `keep`) cut junk collisions; more blocks raise the guarantee.
    */
  def chunkCombos(v: Long, blocks: Int, keep: Int): Array[Long] = {
    require(blocks >= 2 && keep >= 1 && keep < blocks && blocks <= 16)
    val bounds = Array.tabulate(blocks + 1)(i => i * 64 / blocks)
    val chunks = Array.tabulate(blocks) { i =>
      val lo = bounds(i); val hi = bounds(i + 1)
      (v >>> lo) & ((1L << (hi - lo)) - 1L)
    }
    val combos = scala.collection.mutable.ArrayBuffer.empty[Long]
    val idx = Array.range(0, keep)
    var comboId = 0L
    var done = false
    while (!done) {
      var key = comboId // tag with combination index → disjoint key spaces
      var i = 0
      while (i < keep) {
        val c = idx(i)
        key = key * 0x100000001b3L + chunks(c) + 1L // FNV-ish fold, order-sensitive
        i += 1
      }
      // avalanche the fold: the raw FNV key's LOW 32 bits are structured
      // ((c0+1)·435 + c1 + …, since the FNV prime is 2^40 + 435), so any
      // downstream 32-bit truncation would alias ~150 distinct chunk pairs
      // per key and break the Hamming guarantee via stop-band drops at
      // scale; mix64 spreads the fold over all 64 bits
      combos += mix64(key)
      // next combination (lexicographic)
      var p = keep - 1
      while (p >= 0 && idx(p) == blocks - keep + p) p -= 1
      if (p < 0) done = true
      else {
        idx(p) += 1
        var q = p + 1
        while (q < keep) { idx(q) = idx(q - 1) + 1; q += 1 }
      }
      comboId += 1
    }
    combos.toArray
  }
}
