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

  /** bandId -> 64-bit band hash from an unpacked signature: the LOW 32
    * bits are exactly the reference's `MinHash.hashData(list, 0)` value
    * (mmh3 seed 0 of the stringified band — bit-parity preserved); the
    * HIGH 32 bits are an independent second hash (seed 1) of the same
    * string. Two signatures with equal projected band values still agree
    * on the full 64 bits (same string → same hashes), so true candidates
    * are unchanged — the extension only removes 32-bit ALIASING between
    * different band strings. That matters at the 10^12-doc design point:
    * ~10^12 postings per band table into 2^32 buckets would average
    * ~250 UNRELATED postings per bucket (pure junk candidate pairs, and
    * enough to push every bucket toward the stop-band cap); 2^64 keeps
    * buckets content-defined.
    */
  def bandHashes(sig: Array[Int]): Array[Long] = {
    val proj = projection
    val out = new Array[Long](proj.length)
    var b = 0
    while (b < proj.length) {
      val idx = proj(b)
      val sb = new java.lang.StringBuilder(idx.length * 4)
      var i = 0
      while (i < idx.length) { sb.append(sig(idx(i))); i += 1 }
      val s = sb.toString
      out(b) = Murmur3.hashU(s, 0) | (Murmur3.hashU(s, 1) << 32)
      b += 1
    }
    out
  }
}
