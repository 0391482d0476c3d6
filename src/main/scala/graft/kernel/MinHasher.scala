package graft.kernel

/** MinHash signature computation, ≅ MinHasher
  * (/root/reference/mcrit/minhash/MinHasher.py:126-211). Default strategy is
  * SEGMENTED: signature positions are pre-assigned to shinglers by weight
  * (16 fuzzy-stat + 48 k-gram slots at the 1:3 default), position i takes
  * min(shingle ^ xorSeed_i) over that shingler's shingles only, reduced mod
  * 2^signatureBits and packed little-endian (uint8 at the 8-bit default,
  * ≅ MinHash.setMinHash, /root/reference/mcrit/minhash/MinHash.py:53-58).
  */
final class MinHasher(val cfg: GraftConfig) extends Serializable {
  @transient private lazy val shinglers: Seq[Shingler] = Shinglers.active(cfg)
  @transient private lazy val byName: Map[String, Shingler] =
    shinglers.map(s => s.name -> s).toMap

  def isHashable(doc: TextNorm.Tokenized): Boolean = doc.numTokens > cfg.minTokens

  /** Unpacked signature (values in [0, 2^signatureBits)). */
  def signature(doc: TextNorm.Tokenized): Array[Int] = cfg.strategy match {
    case MinHashStrategy.Segmented => segmented(doc)
    case MinHashStrategy.XorAll => xorAll(doc)
    case MinHashStrategy.HashAll => hashAll(doc)
  }

  def signatureBytes(doc: TextNorm.Tokenized): Array[Byte] = pack(signature(doc))

  private def reduce(v: Long): Int =
    if (cfg.signatureBits < 32) (v & ((1L << cfg.signatureBits) - 1)).toInt
    else v.toInt

  /** Segmented signature from pre-hashed per-shingler shingle sets —
    * lets callers that also need the raw shingles (SimHash channel) hash
    * them exactly once. Keys must cover every name in cfg.segments.
    */
  def signatureFromShingles(outputs: Map[String, Array[Long]]): Array[Int] = {
    val sig = new Array[Int](cfg.signatureLength)
    var i = 0
    while (i < cfg.signatureLength) {
      val seed = cfg.minhashXorSeeds(i)
      val shingles = outputs(cfg.segments(i))
      var min = Long.MaxValue
      var j = 0
      while (j < shingles.length) {
        val x = shingles(j) ^ seed
        if (x < min) min = x
        j += 1
      }
      sig(i) = reduce(min)
      i += 1
    }
    sig
  }

  /** ≅ _calculateMinHashSegmented (MinHasher.py:186-211). */
  private def segmented(doc: TextNorm.Tokenized): Array[Int] = {
    val outputs: Map[String, Array[Long]] =
      shinglers.map(s => s.name -> s.process(doc, 0, useWeights = false)(0)).toMap
    val sig = new Array[Int](cfg.signatureLength)
    var i = 0
    while (i < cfg.signatureLength) {
      val seed = cfg.minhashXorSeeds(i)
      val shingles = outputs(cfg.segments(i))
      var min = Long.MaxValue
      var j = 0
      while (j < shingles.length) {
        val x = shingles(j) ^ seed
        if (x < min) min = x
        j += 1
      }
      sig(i) = reduce(min)
      i += 1
    }
    sig
  }

  /** ≅ _calculateMinHashAllXored (MinHasher.py:154-184). */
  private def xorAll(doc: TextNorm.Tokenized): Array[Int] = {
    val all: Array[Long] =
      shinglers.sortBy(_.name).flatMap(s => s.process(doc, 0, useWeights = true).toSeq.flatten).toArray
    val sig = new Array[Int](cfg.signatureLength)
    var i = 0
    while (i < cfg.signatureLength) {
      val seed = cfg.minhashXorSeeds(i)
      var min = Long.MaxValue
      var j = 0
      while (j < all.length) {
        val x = all(j) ^ seed
        if (x < min) min = x
        j += 1
      }
      sig(i) = reduce(min)
      i += 1
    }
    sig
  }

  /** ≅ _calculateMinHashAllSeeds (MinHasher.py:126-152); we reuse the seeded
    * XOR sequence as mmh3 hash seeds (non-default strategy).
    */
  private def hashAll(doc: TextNorm.Tokenized): Array[Int] = {
    val sig = new Array[Int](cfg.signatureLength)
    var i = 0
    while (i < cfg.signatureLength) {
      val seed = (cfg.minhashXorSeeds(i) & 0x7fffffffL).toInt
      var min = Long.MaxValue
      for (s <- shinglers) {
        val groups = s.process(doc, seed, useWeights = true)
        for (g <- groups; v <- g) if (v < min) min = v
      }
      sig(i) = reduce(min)
      i += 1
    }
    sig
  }

  /** Little-endian packing, uint8 per entry at <=8 bits else uint32. */
  def pack(sig: Array[Int]): Array[Byte] =
    if (cfg.signatureBits <= 8) sig.map(_.toByte)
    else {
      val out = new Array[Byte](sig.length * 4)
      var i = 0
      while (i < sig.length) {
        val v = sig(i)
        out(i * 4) = v.toByte
        out(i * 4 + 1) = (v >>> 8).toByte
        out(i * 4 + 2) = (v >>> 16).toByte
        out(i * 4 + 3) = (v >>> 24).toByte
        i += 1
      }
      out
    }

  def unpack(bytes: Array[Byte]): Array[Int] =
    if (cfg.signatureBits <= 8) bytes.map(_ & 0xff)
    else Array.tabulate(bytes.length / 4) { i =>
      (bytes(i * 4) & 0xff) | ((bytes(i * 4 + 1) & 0xff) << 8) |
        ((bytes(i * 4 + 2) & 0xff) << 16) | ((bytes(i * 4 + 3) & 0xff) << 24)
    }
}

object MinHasher {
  /** Positional signature equality percent, ≅ MinHash.calculateMinHashScore
    * (/root/reference/mcrit/minhash/MinHash.py:83-91). Entry width follows
    * the config's signatureBits (1 byte at <=8, else 4).
    */
  def score(a: Array[Byte], b: Array[Byte], signatureBits: Int = 8): Double = {
    if (signatureBits <= 8) {
      var eq = 0
      var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      100.0 * eq / a.length
    } else {
      val n = a.length / 4
      var eq = 0
      var i = 0
      while (i < n) {
        var same = true
        var j = 0
        while (j < 4 && same) { if (a(i * 4 + j) != b(i * 4 + j)) same = false; j += 1 }
        if (same) eq += 1
        i += 1
      }
      100.0 * eq / n
    }
  }
}
