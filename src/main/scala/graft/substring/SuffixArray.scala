package graft.substring

/** Suffix array (prefix-doubling, O(n log² n)) + Kasai LCP over int
  * sequences — used to find the longest common token run between two
  * documents exactly (the per-pair verification of the substring stage).
  * Public textbook algorithms.
  */
object SuffixArray {

  /** Suffix array of `s` (values may be any ints; ranks are computed). */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var sa = Array.range(0, n)
    var rank = new Array[Int](n)
    // initial ranks from element values
    val sorted = s.distinct.sorted
    val rankOf = sorted.zipWithIndex.toMap
    var i = 0
    while (i < n) { rank(i) = rankOf(s(i)); i += 1 }
    var tmp = new Array[Int](n)
    var k = 1
    while (k < n) {
      val ord = new Ordering[Int] {
        def compare(a: Int, b: Int): Int = {
          if (rank(a) != rank(b)) return rank(a) - rank(b)
          val ra = if (a + k < n) rank(a + k) else -1
          val rb = if (b + k < n) rank(b + k) else -1
          ra - rb
        }
      }
      sa = sa.sortWith((a, b) => ord.compare(a, b) < 0)
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (ord.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      // swap references — copying tmp into rank would alias the two arrays
      val t = rank; rank = tmp; tmp = t
      if (rank(sa(n - 1)) == n - 1) return sa
      k <<= 1
    }
    sa
  }

  /** Kasai LCP: lcp(i) = common-prefix length of sa(i) and sa(i-1). */
  def lcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val out = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        out(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  /** Matching statistics of `b` against `a` (Chang–Lawler): ms(i) = length
    * of the longest prefix of b's suffix starting at i that occurs ANYWHERE
    * in `a`. Computed from the generalized suffix array of a#b: for each
    * b-suffix, the best match is against the nearest a-suffix above or
    * below it in SA order, with match length = the min of the LCP values
    * between them — two linear sweeps. The unique separator can never be
    * part of a common prefix (it occurs once), so runs stop at it
    * naturally. O((|a|+|b|) log(|a|+|b|)).
    */
  def matchingStatistics(a: Array[Int], b: Array[Int]): Array[Int] = {
    val ms = new Array[Int](b.length)
    if (a.isEmpty || b.isEmpty) return ms
    val sep = Int.MinValue + 1
    val s = new Array[Int](a.length + 1 + b.length)
    System.arraycopy(a, 0, s, 0, a.length)
    s(a.length) = sep
    System.arraycopy(b, 0, s, a.length + 1, b.length)
    val sa = build(s)
    val l = lcp(s, sa)
    val n = s.length
    // downward sweep: best = min LCP back to the nearest a-suffix above
    var best = -1 // -1 = no a-suffix seen yet
    var i = 0
    while (i < n) {
      if (i > 0 && best >= 0) best = math.min(best, l(i))
      if (sa(i) < a.length) best = Int.MaxValue
      else if (sa(i) > a.length && best >= 0) {
        val bi = sa(i) - a.length - 1
        if (best > ms(bi)) ms(bi) = best
      }
      i += 1
    }
    // upward sweep: nearest a-suffix below
    best = -1
    i = n - 1
    while (i >= 0) {
      if (sa(i) < a.length) best = Int.MaxValue
      else if (sa(i) > a.length && best >= 0) {
        val bi = sa(i) - a.length - 1
        if (best > ms(bi)) ms(bi) = best
      }
      if (i > 0 && best >= 0) best = math.min(best, l(i))
      i -= 1
    }
    // Int.MaxValue sentinels can only leak if min() was never applied,
    // which cannot happen for a b-suffix (an lcp step always sits between
    // it and any a-suffix); clamp defensively to the suffix length anyway.
    var j = 0
    while (j < b.length) {
      if (ms(j) > b.length - j) ms(j) = b.length - j
      j += 1
    }
    ms
  }

  /** Longest common substring (token run) between two int sequences:
    * suffix array over a#b with a unique separator, max LCP across the
    * boundary. Returns (length, startA, startB).
    */
  def longestCommonRun(a: Array[Int], b: Array[Int]): (Int, Int, Int) = {
    if (a.isEmpty || b.isEmpty) return (0, 0, 0)
    val sep = Int.MinValue + 1 // cannot occur in token hashes (we mask to 31 bits)
    val s = new Array[Int](a.length + 1 + b.length)
    System.arraycopy(a, 0, s, 0, a.length)
    s(a.length) = sep
    System.arraycopy(b, 0, s, a.length + 1, b.length)
    val sa = build(s)
    val l = lcp(s, sa)
    var best = 0
    var bestA = 0
    var bestB = 0
    var i = 1
    while (i < s.length) {
      val p = sa(i - 1)
      val q = sa(i)
      val fromA = p < a.length
      val fromB = q < a.length
      if (fromA != fromB && l(i) > best) {
        best = l(i)
        if (fromA) { bestA = p; bestB = q - a.length - 1 }
        else { bestA = q; bestB = p - a.length - 1 }
      }
      i += 1
    }
    (best, bestA, bestB)
  }
}
