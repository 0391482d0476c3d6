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
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
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
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
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

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 4×16-bit chunks for Hamming-ball candidate banding. */
  def chunks16(v: Long): Array[Int] =
    Array.tabulate(4)(i => ((v >>> (16 * i)) & 0xffffL).toInt)
}
