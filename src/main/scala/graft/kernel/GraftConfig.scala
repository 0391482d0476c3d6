package graft.kernel

import graft.hash.PyRandom
import java.security.MessageDigest

/** Pipeline configuration mirroring the reference's MinHashConfig /
  * ShinglerConfig / StorageConfig defaults
  * (/root/reference/mcrit/config/MinHashConfig.py:14-43,
  *  /root/reference/mcrit/config/ShinglerConfig.py:20-34,
  *  /root/reference/mcrit/config/StorageConfig.py:31-39).
  *
  * Every derived constant (XOR seeds, shingler XOR values, band projections)
  * is produced from the seeds with CPython-`random`-compatible MT19937 so the
  * "same shingle/signature config" invariant holds bit-for-bit.
  */
final case class GraftConfig(
    signatureLength: Int = 64,
    signatureBits: Int = 8,
    strategy: MinHashStrategy = MinHashStrategy.Segmented,
    minTokens: Int = 10,               // ≅ MINHASH_FN_MIN_INS
    matchingThreshold: Double = 50.0,  // score must be strictly greater
    minhashSeed: Long = 0xdeadbeefL,
    shinglerSeed: Long = 0xdeadbeefL,
    bandSeed: Long = 0xdeadbeefL,
    // band_size -> num_bands, insertion-ordered like the reference dict
    bands: Seq[(Int, Int)] = Seq(4 -> 20),
    bandStrategy: String = "random",
    bandMatchesRequired: Int = 2,
    // shingler name -> weight; ≅ {FuzzyStatPairShingler:1, EscapedBlockShingler:3}
    shinglerWeights: Map[String, Int] = Map("FuzzyStatShingler" -> 1, "KGramShingler" -> 3),
    logBuckets: Int = 100000,
    logBucketRange: Int = 1,
    logBucketCentered: Boolean = true,
    kGram: Int = 3,
    exactHashMinTokens: Int = 10       // ≅ PICHASH_SIZE
) {
  /** 64 XOR seeds, ≅ MinHasher._initMinhashing (MinHasher.py:33-37). */
  lazy val minhashXorSeeds: Array[Long] = {
    val r = new PyRandom(minhashSeed)
    Array.fill(signatureLength)(r.randintU32())
  }

  /** [0] ++ weight-many XOR values, ≅ ShingleLoader._updateXorValues. */
  lazy val shinglerXorValues: Array[Long] = {
    val r = new PyRandom(shinglerSeed)
    val maxW = shinglerWeights.values.max
    0L +: Array.fill(maxW)(r.randintU32())
  }

  /** Signature position -> shingler name, ≅ generate_segmented_sequence
    * (/root/reference/mcrit/libs/utility.py:38-47): weight-ascending order,
    * int(w/sum*len) slots each, remainder appended to the last shingler.
    */
  lazy val segments: Array[String] = {
    val sum = shinglerWeights.values.sum
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var last: String = null
    for ((name, w) <- shinglerWeights.toSeq.sortBy(_._2)) {
      val n = w * signatureLength / sum
      var i = 0
      while (i < n) { buf += name; i += 1 }
      last = name
    }
    if (shinglerWeights.nonEmpty && buf.length < signatureLength) buf += last
    buf.toArray
  }

  /** Band projections: bandId -> signature indices,
    * ≅ StorageInterface.createBandhashProjection (StorageInterface.py:700-728).
    */
  lazy val bandProjection: Array[Array[Int]] = bandStrategy match {
    case "random" =>
      val r = new PyRandom(bandSeed)
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      for ((bandSize, numBands) <- bands; _ <- 0 until numBands) {
        val idx = Array.range(0, signatureLength)
        r.shuffle(idx)
        out += idx.take(bandSize)
      }
      out.toArray
    case "linear" =>
      require(bands.size == 1, "linear banding needs a single band size")
      val (bandSize, numBands) = bands.head
      require(bandSize * numBands == signatureLength,
        s"linear banding needs size*num == signatureLength")
      val step = signatureLength / bandSize
      Array.tabulate(numBands)(b => Array.tabulate(bandSize)(i => i * step + b))
    case other => throw new IllegalArgumentException(s"unknown band strategy $other")
  }

  def numBands: Int = bands.map(_._2).sum

  /** SHA-256 config fingerprint, ≅ MinHashConfig.getConfigHash +
    * ShinglerConfig.getConfigHash — stamped on every checkpoint table so
    * resumed runs verify identical config.
    */
  lazy val configHash: String = {
    val s = s"_${strategy.id}_${minTokens}_${signatureLength}_${signatureBits}_${minhashSeed}" +
      s"_${shinglerWeights.toSeq.sorted.map { case (k, v) => s"$k-$v" }.mkString(",")}" +
      s"_${shinglerSeed}_${bandSeed}_${bands.map { case (k, v) => s"$k:$v" }.mkString(",")}" +
      s"_${bandStrategy}_${bandMatchesRequired}_${matchingThreshold}" +
      s"_${logBuckets}_${logBucketRange}_${logBucketCentered}_${kGram}_${exactHashMinTokens}"
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

sealed abstract class MinHashStrategy(val id: Int)
object MinHashStrategy {
  case object HashAll extends MinHashStrategy(1)
  case object XorAll extends MinHashStrategy(2)
  case object Segmented extends MinHashStrategy(3)
}

object GraftConfig {
  val default: GraftConfig = GraftConfig()

  /** Default config re-banded for a target Jaccard threshold: bands/rows
    * from `LshPlanner.plan` over the same 64-position signature. The
    * planner models the ≥1-band collision curve, so the produced config
    * also sets `bandMatchesRequired = 1` — leaving the default 2 would
    * silently square the realized curve (and a 1-band plan would emit
    * nothing at all). The configHash changes with the banding, so
    * persisted indexes and checkpoints built under a different threshold
    * invalidate automatically.
    *
    * `bandStrategy` is forced to "random": the planner is free to pick
    * rows×bands ≠ signatureLength (overlapping random projections), which
    * "linear" cannot represent — inheriting a linear base would only fail
    * LAZILY at the first `bandProjection` use.
    */
  def forThreshold(threshold: Double, base: GraftConfig = default,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): GraftConfig = {
    val p = LshPlanner.plan(threshold, base.signatureLength, fpWeight, fnWeight)
    base.copy(bands = Seq(p.rows -> p.bands), bandMatchesRequired = 1,
      bandStrategy = "random")
  }
}
