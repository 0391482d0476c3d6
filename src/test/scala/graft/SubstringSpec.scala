package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.substring.{SuffixArray, SubstringStage}

class SuffixArraySpec extends AnyFunSuite {
  test("suffix array of banana-like sequence is correctly sorted") {
    // "banana" as ints: b=1,a=0,n=2
    val s = Array(1, 0, 2, 0, 2, 0)
    val sa = SuffixArray.build(s)
    assert(sa.toSeq == Seq(5, 3, 1, 0, 4, 2))
    val l = SuffixArray.lcp(s, sa)
    assert(l.toSeq == Seq(0, 1, 3, 0, 0, 2))
  }

  test("longest common run finds shared span and offsets") {
    val a = Array(1, 2, 3, 4, 5, 6, 7, 8)
    val b = Array(9, 9, 4, 5, 6, 7, 9)
    val (len, pa, pb) = SuffixArray.longestCommonRun(a, b)
    assert(len == 4)
    assert(pa == 3 && pb == 2)
    assert(a.slice(pa, pa + len).toSeq == b.slice(pb, pb + len).toSeq)
  }

  test("no common run returns 0") {
    val (len, _, _) = SuffixArray.longestCommonRun(Array(1, 2, 3), Array(4, 5, 6))
    assert(len == 0)
  }
}

class SubstringStageSpec extends SparkTestBase {
  import spark.implicits._

  test("substring stage catches a long shared excerpt LSH would miss") {
    // docs A/B: mostly different, but share a 60-token verbatim excerpt
    val excerpt = (1 to 60).map(i => s"shared${('a' + i % 26).toChar}tok$i").mkString(" ")
    val a = (1 to 300).map(i => s"aw$i").mkString(" ") + " " + excerpt
    val b = excerpt + " " + (1 to 300).map(i => s"bw$i").mkString(" ")
    val c = (1 to 200).map(i => s"cw$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")

    val out = SubstringStage.run(spark, docs, window = 40, stride = 20, minRun = 40)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getInt(2) >= 60, s"run length ${r.getInt(2)} should cover the excerpt")
  }

  test("anchors are stride-aligned rolling hashes") {
    val hs = Array.tabulate(100)(i => i + 1)
    val as = SubstringStage.anchors(hs, window = 40, stride = 20)
    assert(as.map(_._2).toSeq == Seq(0, 20, 40, 60))
    // identical windows hash identically
    val as2 = SubstringStage.anchors(hs.clone(), 40, 20)
    assert(as.toSeq == as2.toSeq)
  }
}
