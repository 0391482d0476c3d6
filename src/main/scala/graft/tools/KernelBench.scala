package graft.tools

import graft.kernel._
import graft.pipeline.DocSig

/** JVM-only micro-benchmark of the per-doc signature kernel. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val rng = new java.util.Random(1)
    def letters(v0: Long): String = {
      var v = math.abs(v0); val sb = new StringBuilder
      do { sb += ('a' + (v % 26)).toChar; v /= 26 } while (v > 0)
      sb.toString
    }
    val texts = (0 until 200).map { c =>
      (0 until 3).map { _ =>
        (0 until 80).map(_ => s"${letters(c)}q${letters(rng.nextInt(4000))}").mkString(" ")
      }.mkString("\n\n")
    }
    val kernel = new DocSig.Kernel(GraftConfig.default)
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s $dt%7.2f s  (${dt / n * 1e6}%8.2f us/doc)")
    }
    // warmup
    for (i <- 0 until 5000) kernel.compute(s"w$i", texts(i % texts.length))
    timed("full kernel") {
      for (i <- 0 until n) kernel.compute(s"u$i", texts(i % texts.length))
    }
    timed("tokenize only") {
      for (i <- 0 until n) TextNorm.tokenize(texts(i % texts.length))
    }
    val toksAll = texts.map(TextNorm.tokenize)
    timed("kgram hashedShingles") {
      val kg1 = new KGramShingler(GraftConfig.default, 1)
      for (i <- 0 until n) kg1.hashedShingles(toksAll(i % toksAll.length))
    }
    // NOTE: this times the REPLACED String-materializing reference path
    // (the shipped kernel assembles normalized bytes directly inside
    // Kernel.compute — its cost is only visible in "full kernel"); kept as
    // the upper-bound comparison line
    timed("norm+exacthash (old)") {
      for (i <- 0 until n) {
        val tok = toksAll(i % toksAll.length)
        val normalized = tok.paraTokens.map(_.mkString(" ")).mkString("\n")
        graft.hash.SimHash.hash64(normalized)
        graft.hash.SimHash.hash64b(normalized)
      }
    }
    val toks = toksAll
    val kg = new KGramShingler(GraftConfig.default, 1)
    timed("kgram sequences") {
      for (i <- 0 until n) kg.generateSequences(toks(i % toks.length))
    }
    val seqs = toks.map(kg.generateSequences)
    timed("mmh3 of sequences") {
      for (i <- 0 until n) seqs(i % seqs.length).foreach(s => graft.hash.Murmur3.hashU(s, 0))
    }
    val hashed = seqs.map(_.iterator.map(s => graft.hash.Murmur3.hashU(s, 0)).toArray)
    val mh = new MinHasher(GraftConfig.default)
    val fz = new FuzzyStatShingler(GraftConfig.default, 1)
    timed("fuzzy shingles") {
      for (i <- 0 until n) fz.process(toks(i % toks.length), 0, useWeights = false)
    }
    val fzh = toks.map(t => fz.process(t, 0, useWeights = false)(0))
    timed("64-slot minhash") {
      for (i <- 0 until n) mh.signatureFromShingles(
        Map("KGramShingler" -> hashed(i % hashed.length), "FuzzyStatShingler" -> fzh(i % fzh.length)))
    }
    timed("simhash votes") {
      for (i <- 0 until n) graft.hash.SimHash.ofHashes(hashed(i % hashed.length))
    }
  }
}
