package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel._
import graft.hash.{Murmur3, SimHash}

/** Property tests (SURVEY.md §5): score bounds/symmetry, signature
  * determinism, hash stability, logbucket invariants. Cases come from a
  * seeded generator (deterministic; no external property framework needed).
  */
class PropertySpec extends AnyFunSuite {
  private val cfg = GraftConfig.default
  private val mh = new MinHasher(cfg)
  private val Cases = 200

  private def rng(seed: Int) = new java.util.Random(seed)

  private def genText(r: java.util.Random): String = {
    val n = r.nextInt(120)
    (0 until n).map { _ =>
      if (r.nextBoolean()) {
        val len = 1 + r.nextInt(8)
        (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      } else r.nextInt(10000).toString
    }.mkString(" ")
  }

  test("score is symmetric, within [0,100], reflexive 100") {
    val r = rng(1)
    var checked = 0
    for (_ <- 0 until Cases) {
      val (a, b) = (genText(r), genText(r))
      val ta = TextNorm.tokenize(a)
      val tb = TextNorm.tokenize(b)
      if (mh.isHashable(ta) && mh.isHashable(tb)) {
        val sa = mh.signatureBytes(ta)
        val sb = mh.signatureBytes(tb)
        val s1 = MinHasher.score(sa, sb)
        assert(s1 == MinHasher.score(sb, sa))
        assert(s1 >= 0.0 && s1 <= 100.0)
        assert(MinHasher.score(sa, sa) == 100.0)
        checked += 1
      }
    }
    assert(checked > Cases / 2)
  }

  test("signatures and simhash are pure functions of the text") {
    val r = rng(2)
    for (_ <- 0 until Cases) {
      val t = genText(r)
      val tok1 = TextNorm.tokenize(t)
      val tok2 = TextNorm.tokenize(t)
      if (mh.isHashable(tok1)) {
        assert(mh.signatureBytes(tok1).toSeq == mh.signatureBytes(tok2).toSeq)
        val kg = new KGramShingler(cfg, 1)
        assert(SimHash.of(kg.generateSequences(tok1)) == SimHash.of(kg.generateSequences(tok2)))
      }
    }
  }

  test("murmur3 outputs are unsigned 32-bit; byte/string paths agree") {
    val r = rng(3)
    for (_ <- 0 until Cases) {
      val s = genText(r).take(50)
      val seed = r.nextInt()
      val h = Murmur3.hashU(s, seed)
      assert(h >= 0L && h <= 0xffffffffL)
      assert(h == Murmur3.hashU(s.getBytes("UTF-8"), seed))
    }
  }

  test("logbucket ranges are ordered and windows grow log-wise") {
    val r = rng(4)
    for (_ <- 0 until Cases * 10) {
      val v = math.abs(r.nextLong()) % 1000000L
      val (lo, mid, hi) = LogBucket.range(v)
      assert(lo <= mid && mid <= hi, s"v=$v")
      assert(mid >= v || v <= 1, s"middle bucket rounds up: v=$v mid=$mid")
      assert(hi - lo <= math.max(2, mid), s"window bounded: v=$v ($lo,$mid,$hi)")
    }
  }

  test("band hashes deterministic, one per configured band") {
    val r = rng(5)
    val bands = new Bands(cfg)
    for (_ <- 0 until Cases) {
      val sig = Array.fill(64)(r.nextInt(256))
      assert(bands.bandHashes(sig).toSeq == bands.bandHashes(sig.clone()).toSeq)
      assert(bands.bandHashes(sig).length == cfg.numBands)
    }
  }

  test("suffix-array longest common run: symmetric length, never exceeds inputs") {
    val r = rng(6)
    for (_ <- 0 until Cases) {
      val a = Array.fill(5 + r.nextInt(40))(1 + r.nextInt(8))
      val b = Array.fill(5 + r.nextInt(40))(1 + r.nextInt(8))
      val (l1, pa, pb) = graft.substring.SuffixArray.longestCommonRun(a, b)
      val (l2, _, _) = graft.substring.SuffixArray.longestCommonRun(b, a)
      assert(l1 == l2)
      assert(l1 <= math.min(a.length, b.length))
      if (l1 > 0)
        assert(a.slice(pa, pa + l1).toSeq == b.slice(pb, pb + l1).toSeq)
    }
  }
}
