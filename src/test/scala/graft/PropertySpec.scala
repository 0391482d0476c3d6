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

  test("fused extract normalization ≡ sequential replace/split/collapse chain") {
    // the reference composition the single-scan normalizeStripped replaced
    def reference(s: String): String = {
      val un = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
      java.util.regex.Pattern.compile("\n{2,}").split(un).iterator
        .map(p => java.util.regex.Pattern.compile("\\s+").matcher(p).replaceAll(" ").trim)
        .filter(_.nonEmpty)
        .mkString("\n\n")
    }
    val pieces = Array("a", "bc", "&", ";", "&amp;", "&lt;", "&gt;", "&quot;",
      "&#39;", "&nbsp;", "&am", "lt;", "&lt", "#39;", " ", "\t", "\n", "\n\n",
      "\r", "\u000B", "\f", "x1", "9", "&&", "&nbsp", ";;")
    for (seed <- 0 until 500) {
      val r = rng(seed)
      val s = (0 until r.nextInt(60)).map(_ => pieces(r.nextInt(pieces.length))).mkString
      val got = TextNorm.normalizeStripped(s)
      val want = reference(s)
      assert(got == want, s"input ${s.replace("\n", "\\n")}:\n got [$got]\nwant [$want]")
    }
  }

  test("single-scan tokenize ≡ paragraphs/rawTokens/normalizeToken composition") {
    def reference(text: String): (Seq[Seq[String]], Seq[String]) = {
      val paras = TextNorm.paragraphs(text)
      val rawPer = paras.map(TextNorm.rawTokens)
      val norm = rawPer.map(_.map(TextNorm.normalizeToken).filter(_.nonEmpty).toSeq)
        .filter(_.nonEmpty).toSeq
      (norm, rawPer.flatten.toSeq)
    }
    val pieces = Array("word", "W0rd", "...", "!x!", "1234", "a-b", " ", "  ",
      "\t", "\n", "\n\n", "\n\n\n", "\r\n", "\u000B", "\f", "é", "")
    for (seed <- 0 until 500) {
      val r = rng(seed)
      val text = (0 until r.nextInt(50)).map(_ => pieces(r.nextInt(pieces.length))).mkString
      val got = TextNorm.tokenize(text)
      val (wantNorm, wantRaw) = reference(text)
      assert(got.paraTokens.map(_.toSeq).toSeq == wantNorm, s"paraTokens for [${text.replace("\n", "\\n")}]")
      assert(got.rawToks.toSeq == wantRaw, s"rawToks for [${text.replace("\n", "\\n")}]")
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

  test("chunkCombos guarantee: any pair within hamming blocks−keep shares a key") {
    val r = rng(7)
    for (_ <- 0 until Cases) {
      val blocks = 4 + r.nextInt(5) // 4..8
      val keep = 1 + r.nextInt(blocks - 1)
      val guarantee = blocks - keep
      val v = r.nextLong()
      // flip exactly `guarantee` random distinct bits
      val bits = r.ints(0, 64).distinct().limit(guarantee).toArray
      val w = bits.foldLeft(v)((acc, b) => acc ^ (1L << b))
      val kv = SimHash.chunkCombos(v, blocks, keep).toSet
      val kw = SimHash.chunkCombos(w, blocks, keep).toSet
      assert(kv.intersect(kw).nonEmpty,
        s"blocks=$blocks keep=$keep flips=${bits.mkString(",")}")
      // count: C(blocks, keep) keys
      def choose(n: Int, k: Int): Long =
        (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
      assert(kv.size <= choose(blocks, keep))
    }
  }

  test("winnowing guarantee: shared run ≥ window+winnow−1 ⇒ shared anchor, any offsets") {
    val r = rng(8)
    for (_ <- 0 until Cases) {
      val window = 4 + r.nextInt(20)
      val winnow = 1 + r.nextInt(12)
      val runLen = window + winnow - 1 + r.nextInt(10)
      val run = Array.fill(runLen)(r.nextInt(1 << 30))
      val offA = r.nextInt(200)
      val offB = r.nextInt(200)
      val docA = Array.fill(offA)(r.nextInt(1 << 30)) ++ run ++ Array.fill(r.nextInt(50))(r.nextInt(1 << 30))
      val docB = Array.fill(offB)(r.nextInt(1 << 30)) ++ run ++ Array.fill(r.nextInt(50))(r.nextInt(1 << 30))
      val aA = graft.substring.SubstringStage.anchors(docA, window, winnow).toSet
      val aB = graft.substring.SubstringStage.anchors(docB, window, winnow).toSet
      assert(aA.intersect(aB).nonEmpty, s"window=$window winnow=$winnow offA=$offA offB=$offB")
    }
  }

  test("cursor codec round-trips arbitrary field names and values") {
    import graft.ops.SearchCursor._
    val r = rng(9)
    val chars = "abc|%:=_ -/\\\"'"
    def str(): String = (0 until 1 + r.nextInt(12)).map(_ => chars(r.nextInt(chars.length))).mkString
    for (_ <- 0 until Cases) {
      val n = 1 + r.nextInt(4)
      val c = Cursor(
        // field names draw from the FULL adversarial alphabet (incl. ':' '|'
        // '%'), same as values — the codec must escape them symmetrically
        (0 until n).map(i => SortField("f" + i + str(), r.nextBoolean())),
        (0 until n).map(_ => Seq("l", "d", "s")(r.nextInt(3))),
        (0 until n).map(_ => str()),
        forward = r.nextBoolean())
      assert(decode(encode(c)) == c)
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
