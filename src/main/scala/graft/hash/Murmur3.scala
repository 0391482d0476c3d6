package graft.hash

/** MurmurHash3 x86_32, bit-compatible with Python's `mmh3.hash(data, seed)`
  * (and the pure-python fallback used by the reference, cf.
  * /root/reference/mcrit/libs/pymmh3.py:34-95 and
  * /root/reference/mcrit/minhash/MinHash.py:73-81).
  *
  * The reference hashes UTF-8 strings and returns the unsigned 32-bit value
  * (`mmh3.hash(s, seed) & 0xFFFFFFFF`). `hashU` reproduces that as a Long in
  * [0, 2^32).
  *
  * Spark's built-in `hash()`/Murmur3_x86_32 uses a different byte traversal
  * for strings (UTF8String-based, different tail handling ordering per
  * column) and is not seed-parity-safe with mmh3, hence this tiny impl.
  */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** Signed 32-bit murmur3_x86_32 over raw bytes. */
  def hashBytes(data: Array[Byte], seed: Int): Int =
    hashBytes(data, 0, data.length, seed)

  /** Slice variant — lets hot paths hash a reusable scratch buffer. */
  def hashBytes(data: Array[Byte], offset: Int, len: Int, seed: Int): Int = {
    val nBlocks = len >>> 2
    var h1 = seed
    var i = 0
    while (i < nBlocks) {
      val base = offset + (i << 2)
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tailStart = offset + (nBlocks << 2)
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tailStart + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tailStart + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tailStart) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    // finalization
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Unsigned value of mmh3.hash(utf8(s), seed), as Long in [0, 2^32). */
  def hashU(s: String, seed: Int): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed).toLong & 0xffffffffL

  def hashU(data: Array[Byte], seed: Int): Long =
    hashBytes(data, seed).toLong & 0xffffffffL

  /** Slice variant of the unsigned hash — hot paths (band hashing) fill a
    * reusable ASCII scratch and hash it with several seeds without
    * materializing a String or re-encoding UTF-8 per seed. */
  def hashU(data: Array[Byte], offset: Int, len: Int, seed: Int): Long =
    hashBytes(data, offset, len, seed).toLong & 0xffffffffL
}
