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

  /** SimHash from pre-hashed 32-bit shingle values: each is avalanched to
    * 64 bits with the splitmix64 finalizer (saves re-hashing the shingle
    * strings when a MinHash pass already produced their mmh3 values).
    */
  def ofHashes(hs: Array[Long]): Long = {
    if (hs.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = mix64(hs(i))
      // branchless vote: +1 for a set bit, -1 for a clear bit — random bits
      // make the branchy form mispredict ~50% of the time, and this inner
      // pair of loops is the single hottest kernel component (measured
      // ~80 µs/doc branchy → ~2× faster branchless)
      var b = 0
      while (b < 64) {
        votes(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** splitmix64 finalizer (public domain constant mix). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lo = Murmur3.hashBytes(bytes, 0).toLong & 0xffffffffL
    val hi = Murmur3.hashBytes(bytes, 1).toLong & 0xffffffffL
    lo | (hi << 32)
  }

  /** Second independent 64-bit hash (mmh3 seeds 2,3) — paired with `hash64`
    * this forms the 128-bit content identity used by the exact-dup channel:
    * a single 64-bit hash at the 10^12-doc design scale expects ~27k
    * birthday collisions, i.e. silent false exact merges.
    */
  def hash64b(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lo = Murmur3.hashBytes(bytes, 2).toLong & 0xffffffffL
    val hi = Murmur3.hashBytes(bytes, 3).toLong & 0xffffffffL
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
      combos += key
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
