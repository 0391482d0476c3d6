package graft.kernel

import graft.hash.Murmur3

/** LSH band hashing, ≅ StorageInterface.getBandHashesForMinHash
  * (/root/reference/mcrit/storage/StorageInterface.py:731-746): per band,
  * gather signature values at the projected indices and mmh3-hash the
  * decimal-stringified concatenation with seed 0 (exactly the reference's
  * `MinHash.hashData(list, 0)` list-stringification,
  * /root/reference/mcrit/minhash/MinHash.py:76-81).
  */
final class Bands(cfg: GraftConfig) extends Serializable {
  // projection is derived deterministically from the band seed; safe to
  // recompute per executor (small: numBands × bandSize ints)
  @transient private lazy val projection: Array[Array[Int]] = cfg.bandProjection

  /** bandId -> unsigned 32-bit band hash, from an unpacked signature. */
  def bandHashes(sig: Array[Int]): Array[Long] = {
    val proj = projection
    val out = new Array[Long](proj.length)
    var b = 0
    while (b < proj.length) {
      val idx = proj(b)
      val sb = new java.lang.StringBuilder(idx.length * 4)
      var i = 0
      while (i < idx.length) { sb.append(sig(idx(i))); i += 1 }
      out(b) = Murmur3.hashU(sb.toString, 0)
      b += 1
    }
    out
  }
}
