package graft.hash

/** MT19937 generator reproducing CPython's `random` module semantics for the
  * tiny subset the reference pipeline uses for its deterministic seeding:
  *
  *  - `random.seed(int)`            → init_by_array over the int's 32-bit words
  *  - `random.randint(0, 2^32-1)`   → _randbelow(2^32) via getrandbits(33)
  *  - `random.shuffle(list)`        → Fisher–Yates with _randbelow(i+1)
  *
  * The reference derives every deterministic constant this way:
  * MinHash XOR seeds (/root/reference/mcrit/minhash/MinHasher.py:33-37),
  * shingler XOR values (/root/reference/mcrit/minhash/ShingleLoader.py:23-28),
  * LSH band projections (/root/reference/mcrit/storage/StorageInterface.py:700-708).
  * MT19937 and CPython's derivations are public, well-specified algorithms;
  * outputs here are golden-tested against Python 3.11.
  */
final class PyRandom(seed: Long) {
  private val mt = new Array[Int](624)
  private var mti = 625

  init()

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
    var i = 1
    var j = 0
    var k = math.max(624, key.length)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + key(j) + j
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

  private def init(): Unit = {
    // CPython random_seed(n): key = |n| as little-endian 32-bit words.
    require(seed >= 0, "negative seeds not supported")
    val lo = (seed & 0xffffffffL).toInt
    val hi = (seed >>> 32).toInt
    val key = if (hi == 0) Array(lo) else Array(lo, hi)
    initByArray(key)
  }

  /** genrand_uint32 as unsigned in a Long. */
  private def genrand(): Long = {
    if (mti >= 624) {
      var kk = 0
      while (kk < 227) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < 623) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk - 227) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(623) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(623) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= y >>> 11
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= y >>> 18
    y.toLong & 0xffffffffL
  }

  /** CPython getrandbits(k) for k <= 64. */
  def getrandbits(k: Int): Long = {
    require(k > 0 && k <= 64)
    if (k <= 32) genrand() >>> (32 - k)
    else {
      val lo = genrand()
      val rem = k - 32
      val hi = genrand() >>> (32 - rem)
      lo | (hi << 32)
    }
  }

  /** CPython Random._randbelow_with_getrandbits(n). */
  def randbelow(n: Long): Long = {
    require(n > 0)
    val k = 64 - java.lang.Long.numberOfLeadingZeros(n) // n.bit_length()
    var r = getrandbits(k)
    while (r >= n) r = getrandbits(k)
    r
  }

  /** random.randint(0, 0xFFFFFFFF) — the only randint shape the reference uses. */
  def randintU32(): Long = randbelow(0x100000000L)

  /** random.shuffle(x) in place (Python >= 3.11 semantics). */
  def shuffle(x: Array[Int]): Unit = {
    var i = x.length - 1
    while (i >= 1) {
      val j = randbelow(i + 1).toInt
      val t = x(i); x(i) = x(j); x(j) = t
      i -= 1
    }
  }
}
