package graft.kernel

import graft.hash.Murmur3

/** Shingler contract, ≅ AbstractShingler.process
  * (/root/reference/mcrit/shinglers/AbstractShingler.py:41-58): generate
  * string sequences, mmh3-hash each with the given seed, optionally append
  * weight-1 XOR-remapped copies; empty generator output → [[0xFFFFFFFF]].
  */
abstract class Shingler(val name: String, val weight: Int, cfg: GraftConfig) {
  final val HashMax = 0xffffffffL

  def generateSequences(doc: TextNorm.Tokenized): Seq[String]

  /** Returns one or more shingle groups (base + XORed weight copies). */
  def process(doc: TextNorm.Tokenized, hashSeed: Int, useWeights: Boolean): Array[Array[Long]] = {
    val seqs = generateSequences(doc)
    if (seqs.isEmpty) return Array(Array(HashMax))
    val base = seqs.iterator.map(s => Murmur3.hashU(s, hashSeed)).toArray
    if (!useWeights || weight <= 1) Array(base)
    else {
      val out = new Array[Array[Long]](weight)
      out(0) = base
      var w = 1
      while (w < weight) {
        val xor = cfg.shinglerXorValues(w)
        out(w) = base.map(_ ^ xor)
        w += 1
      }
      out
    }
  }
}

/** k-gram shingler, ≅ EscapedBlockShingler
  * (/root/reference/mcrit/shinglers/EscapedBlockShingler.py:25-65): per
  * paragraph ("basic block"), emit sorted k-gram joins ";".join(sorted(gram))
  * per sliding window; paragraphs with ≤ k tokens emit one whole-paragraph
  * shingle.
  */
final class KGramShingler(cfg: GraftConfig, weight: Int)
    extends Shingler("KGramShingler", weight, cfg) {
  private val k = cfg.kGram

  /** Low-garbage fast path: mmh3(seed 0) of every k-gram shingle, emitting
    * the exact same hashes as `generateSequences(...).map(mmh3(_, 0))` —
    * ";".join(sorted(gram)) is built into a reusable byte scratch from
    * per-token cached UTF-8, with an insertion sort over String compareTo
    * (same ordering as sorting the strings). Eliminates the per-window
    * array/String/byte[] churn that dominates GC at high core counts.
    * Returns the sentinel [0xFFFFFFFF] for empty docs.
    */
  def hashedShingles(doc: TextNorm.Tokenized): Array[Long] = {
    // primitive output buffer (an ArrayBuffer[Long] boxes every append —
    // ~200 boxed Longs/doc of pure garbage on the hottest kernel path)
    var out = new Array[Long](256)
    var outN = 0
    var scratch = new Array[Byte](256)
    val utf8 = new java.util.HashMap[String, Array[Byte]](128)
    val widx = new Array[Int](k)
    var p = 0
    while (p < doc.paraTokens.length) {
      val toks = doc.paraTokens(p)
      val m = toks.length
      if (m > 0) {
        // positional UTF-8 byte cache, ONE map probe per token position —
        // the per-window bytesOf() form probed the map k times per window
        // (≈ 3× the lookups for k=3 with sliding overlap)
        val tb = new Array[Array[Byte]](m)
        var i = 0
        while (i < m) {
          val t = toks(i)
          var b = utf8.get(t)
          if (b == null) { b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8); utf8.put(t, b) }
          tb(i) = b
          i += 1
        }
        // insertion-sort window POSITIONS by token order (same String
        // ordering as sorting the strings; equal tokens have identical
        // bytes, so tie order cannot affect the output)
        def hashSortedRange(from: Int, len: Int): Long = {
          val w = if (len <= widx.length) widx else new Array[Int](len)
          var i = 0
          while (i < len) {
            val pos = from + i
            val t = toks(pos)
            var j = i - 1
            while (j >= 0 && toks(w(j)).compareTo(t) > 0) { w(j + 1) = w(j); j -= 1 }
            w(j + 1) = pos
            i += 1
          }
          var total = len - 1 // separators
          i = 0
          while (i < len) { total += tb(w(i)).length; i += 1 }
          if (scratch.length < total) scratch = new Array[Byte](math.max(total, scratch.length * 2))
          var posOut = 0
          i = 0
          while (i < len) {
            if (i > 0) { scratch(posOut) = ';'; posOut += 1 }
            val b = tb(w(i))
            System.arraycopy(b, 0, scratch, posOut, b.length)
            posOut += b.length
            i += 1
          }
          graft.hash.Murmur3.hashBytes(scratch, 0, posOut, 0).toLong & 0xffffffffL
        }
        def push(v: Long): Unit = {
          if (outN == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
          out(outN) = v
          outN += 1
        }
        if (m > k) {
          var i = 0
          val last = m - k
          while (i <= last) { push(hashSortedRange(i, k)); i += 1 }
        } else {
          push(hashSortedRange(0, m))
        }
      }
      p += 1
    }
    if (outN == 0) Array(HashMax) else java.util.Arrays.copyOf(out, outN)
  }

  def generateSequences(doc: TextNorm.Tokenized): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < doc.paraTokens.length) {
      val toks = doc.paraTokens(p)
      if (toks.length > k) {
        var i = 0
        val last = toks.length - k
        while (i <= last) {
          val gram = java.util.Arrays.copyOfRange(toks, i, i + k)
          java.util.Arrays.sort(gram.asInstanceOf[Array[AnyRef]])
          out += gram.mkString(";")
          i += 1
        }
      } else if (toks.nonEmpty) {
        out += toks.sorted.mkString(";")
      }
      p += 1
    }
    out.toSeq
  }
}

/** Fuzzy document-stat shingler, ≅ FuzzyStatPairShingler
  * (/root/reference/mcrit/shinglers/FuzzyStatPairShingler.py:47-105): seven
  * scalar stats, each log-bucketed into a centered (lo, mid, mid, hi) weighted
  * range and emitted as "{field}={count}:{bucket}" strings.
  */
final class FuzzyStatShingler(cfg: GraftConfig, weight: Int)
    extends Shingler("FuzzyStatShingler", weight, cfg) {

  // java.util.HashSet: ~2× cheaper probe than the immutable Scala Set on
  // this 30-entry table, and this probe runs once per token per doc
  private val stopwords: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String](64)
    FuzzyStatShingler.Stopwords.foreach(h.add)
    h
  }

  def generateSequences(doc: TextNorm.Tokenized): Seq[String] = {
    val numTokens = doc.numTokens
    if (numTokens == 0) return Seq.empty
    // ONE pass over the tokens for alpha/stop/digit/uniq (was three iterator
    // traversals plus a Scala toSet — a measurable slice of the per-doc
    // kernel); char predicates match the original forall/exists semantics
    var numAlpha = 0
    var numStop = 0
    var numDigit = 0
    val uniqSet = new java.util.HashSet[String](math.max(16, numTokens * 2))
    val it = doc.allTokens
    while (it.hasNext) {
      val t = it.next()
      var allLetter = true
      var anyDigit = false
      var ci = 0
      val len = t.length
      while (ci < len) {
        val c = t.charAt(ci)
        if (!Character.isLetter(c)) allLetter = false
        if (Character.isDigit(c)) anyDigit = true
        ci += 1
      }
      if (allLetter) numAlpha += 1
      if (anyDigit) numDigit += 1
      if (stopwords.contains(t)) numStop += 1
      uniqSet.add(t)
      ()
    }
    var numUpper = 0
    for (t <- doc.rawToks) if (t.nonEmpty && t.charAt(0).isUpper) numUpper += 1
    val numRaw = math.max(doc.rawToks.length, 1)
    val maxPara = if (doc.paraTokens.isEmpty) 0 else doc.paraTokens.map(_.length).max
    val uniq = uniqSet.size
    // insertion-ordered like the reference's `fields` dict
    val fields: Seq[(String, Long)] = Seq(
      "num_alpha" -> numAlpha.toLong,
      "num_stop" -> numStop.toLong,
      "num_digit_rel" -> (100L * numDigit / numTokens),
      "num_upper_rel" -> (100L * numUpper / numRaw),
      "num_uniq_rel" -> (100L * uniq / numTokens),
      "num_para" -> doc.paraTokens.length.toLong,
      "max_para_size" -> maxPara.toLong
    )
    fields.flatMap { case (name, v) => bucketedValues(name, v) }
  }

  /** ≅ FuzzyStatPairShingler._create_bucketed_values (centered variant). */
  def bucketedValues(fieldName: String, value: Long): Seq[String] = {
    val (lo, mid, hi) = LogBucket.range(value)
    val range = cfg.logBucketRange
    if (!cfg.logBucketCentered) {
      Seq(s"$fieldName:$lo", s"$fieldName:$mid", s"$fieldName:$hi")
    } else {
      val counts = scala.collection.mutable.Map.empty[Long, Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((bucket, index) <- Seq(lo, mid, hi).zipWithIndex) {
        val distance = math.abs(index - range)
        var d = distance
        while (d <= range) {
          val c = counts.getOrElse(bucket, 0) + 1
          counts(bucket) = c
          out += s"$fieldName=$c:$bucket"
          d += 1
        }
      }
      out.toSeq
    }
  }
}

object FuzzyStatShingler {
  /** Tiny fixed English stopword list (public, standard set). */
  val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "not", "but", "have", "has", "had", "they", "you", "we")
}

object Shinglers {
  /** Name-sorted active shinglers, ≅ ShingleLoader.getShinglers. */
  def active(cfg: GraftConfig): Seq[Shingler] = {
    cfg.shinglerWeights.toSeq.map { case (name, w) =>
      name match {
        case "KGramShingler" => new KGramShingler(cfg, w)
        case "FuzzyStatShingler" => new FuzzyStatShingler(cfg, w)
        case other => throw new IllegalArgumentException(s"unknown shingler $other")
      }
    }.sortBy(_.name)
  }
}
