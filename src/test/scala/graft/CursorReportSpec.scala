package graft

import org.apache.spark.sql.functions._
import graft.ops.{SearchCursor, MatchReportOps}
import graft.ops.SearchCursor.{Cursor, SortField}

class SearchCursorSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, 10.0, "a"), (2L, 10.0, "b"), (3L, 20.0, "c"), (4L, 20.0, "d"),
    (5L, 30.0, "e"), (6L, 40.0, "f"), (7L, 50.0, "g"))
    .toDF("id", "price", "tag")
  private val fields = Seq(SortField("price", ascending = true), SortField("id", ascending = true))

  test("cursor encode/decode round-trips fields, types, values, direction") {
    val c = Cursor(fields, Seq("d", "l"), Seq("20.0", "3"), forward = true)
    assert(SearchCursor.decode(SearchCursor.encode(c)) == c)
    val b = c.copy(forward = false, values = Seq("4|2%0", "9"))
    assert(SearchCursor.decode(SearchCursor.encode(b)) == b)
  }

  test("page forward twice then backward reproduces the middle page") {
    val (p1, next1, prev1) = SearchCursor.page(df, fields, None, limit = 3)
    assert(p1.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(prev1.isEmpty && next1.isDefined)

    val (p2, next2, prev2) = SearchCursor.page(df, fields, next1, limit = 3)
    assert(p2.map(_.getLong(0)).toSeq == Seq(4L, 5L, 6L))
    assert(next2.isDefined && prev2.isDefined)

    val (p3, next3, _) = SearchCursor.page(df, fields, next2, limit = 3)
    assert(p3.map(_.getLong(0)).toSeq == Seq(7L))
    assert(next3.isEmpty)

    // walk back from page 2's prev cursor → page 1 again, in user order
    val (back, backNext, _) = SearchCursor.page(df, fields, prev2, limit = 3)
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(backNext.isDefined)
  }

  test("null sort values page correctly in both directions") {
    // nulls sort FIRST in asc and LAST in desc (Spark default); the cursor
    // must encode a null boundary (not the string "null") and the keyset
    // predicate must cover the null region on both sides
    val withNulls = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, null, "a"), (2L, null, "b"), (3L, 10.0, "c"), (4L, 20.0, "d"),
      (5L, 30.0, "e")).toDF("id", "price", "tag")
    def walk(flds: Seq[SortField]): Seq[Long] = {
      var cursor: Option[String] = None
      var out = Seq.empty[Long]
      var continue = true
      while (continue) {
        val (rows, next, _) = SearchCursor.page(withNulls, flds, cursor, limit = 2)
        out ++= rows.map(_.getLong(0))
        cursor = next
        continue = next.isDefined
      }
      out
    }
    val asc = Seq(SortField("price", ascending = true), SortField("id", ascending = true))
    assert(walk(asc) == Seq(1L, 2L, 3L, 4L, 5L), "asc: nulls first, every row once")
    val desc = Seq(SortField("price", ascending = false), SortField("id", ascending = true))
    assert(walk(desc) == Seq(5L, 4L, 3L, 1L, 2L), "desc: null tail reached, every row once")
    // backward from a cursor INSIDE the null region restores the prior page
    val (p1, next1, _) = SearchCursor.page(withNulls, asc, None, limit = 2)
    assert(p1.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val (p2, _, prev2) = SearchCursor.page(withNulls, asc, next1, limit = 2)
    assert(p2.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    val (back, _, _) = SearchCursor.page(withNulls, asc, prev2, limit = 2)
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("keyset predicate is the OR-of-ANDs tree with per-field direction") {
    val c = Cursor(fields, Seq("d", "l"), Seq("20.0", "3"), forward = true)
    val got = df.where(SearchCursor.predicate(c))
      .select("id").as[Long].collect().sorted.toSeq
    // rows strictly after (20.0, 3) in (price asc, id asc) order
    assert(got == Seq(4L, 5L, 6L, 7L))
    // descending first field, backward paging flips again
    val d = Cursor(Seq(SortField("price", ascending = false), SortField("id", ascending = true)),
      Seq("d", "l"), Seq("20.0", "3"), forward = true)
    val gotDesc = df.where(SearchCursor.predicate(d))
      .select("id").as[Long].collect().sorted.toSeq
    assert(gotDesc == Seq(1L, 2L, 4L))
  }
}

class MatchReportSpec extends SparkTestBase {
  import spark.implicits._

  // (sample, function, binweight, fam, sample_m, score, lib, pic, min)
  private val m = Seq(
    (0L, 1L, 10L, 1L, 100L, 100, false, true, true),
    (0L, 1L, 10L, 2L, 101L, 80, false, false, true),
    (0L, 1L, 10L, 3L, 102L, 70, false, false, true), // fn 1: 3 families → adj 2
    (0L, 2L, 20L, 1L, 100L, 60, true, false, true),  // fn 2: library match
    (0L, 2L, 20L, 1L, 100L, 90, false, false, true), // same (fn, sample): max 90
    (0L, 3L, 30L, 4L, 103L, 55, false, false, true)) // fn 3: unique family
    .toDF("sample_id", "function_id", "binweight", "matched_family_id",
      "matched_sample_id", "score", "is_library", "is_pichash", "is_minhash")

  test("six-weighting rollup: exact integer-derived sums") {
    val out = MatchReportOps.sixWeightingRollup(m).collect()
      .map(r => r.getLong(0) -> r).toMap
    val s100 = out(100L)
    // sample 100: fn1 (w10, s100, adj2) + fn2 (w20, max s90, lib-flagged row present)
    assert(s100.getLong(1) == 2) // n_funcs
    assert(s100.getLong(4) == 30) // bytes_all
    assert(s100.getDouble(5) == (10 * 100 + 20 * 90) / 100.0) // score-weighted
    // freq-weighted: fn1 adj 2 (3 families), fn2 adj 1
    assert(s100.getDouble(6) == (10 * 100 / 2.0 + 20 * 90) / 100.0)
    // nonlib: fn2's (fn,sample) best carries the lib flag via max → excluded
    assert(s100.getLong(7) == 10)
    val s103 = out(103L)
    assert(s103.getLong(1) == 1 && s103.getLong(4) == 30)
  }

  test("cross-compare 6-weighting cell math on a hand-computed case") {
    val cm = Seq(
      // sample 1: fn 10 (w5) matches samples 100 (s80) and 200 (s60, LIBRARY);
      //           fn 11 (w3) matches sample 100 (s100, pichash)
      (1L, 10L, 5L, 1L, 100L, 80, false, false, true),
      (1L, 10L, 5L, 2L, 200L, 60, true, false, true),
      (1L, 11L, 3L, 1L, 100L, 100, false, true, true))
      .toDF("sample_id", "function_id", "binweight", "matched_family_id",
        "matched_sample_id", "score", "is_library", "is_pichash", "is_minhash")
    val out = MatchReportOps.crossCompareWeighted(cm).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    val c100 = out((1L, 100L))
    assert(c100.getAs[Long]("n_funcs") == 2 && c100.getAs[Long]("n_pic") == 1 &&
      c100.getAs[Long]("n_min") == 2 && c100.getAs[Long]("n_lib") == 0)
    // total bytes = 5+3 = 8; both matches into 100 are non-library
    assert(c100.getAs[Double]("pct_unweighted") == 100.0)
    assert(c100.getAs[Double]("pct_score_weighted") == (5 * 80 + 3 * 100) / 100.0 / 8 * 100)
    // both functions matched < 3 families → adjustment 1 → freq == score
    assert(c100.getAs[Double]("pct_frequency_weighted") ==
      c100.getAs[Double]("pct_score_weighted"))
    // nonlib denominator excludes fn 10 (it matched a library SOMEWHERE) but
    // the numerator keeps its non-library match into 100 — the reference's
    // asymmetry, so nonlib percent can exceed 100
    assert(c100.getAs[Double]("pct_nonlib_unweighted") == 800.0 / 3.0)

    val c200 = out((1L, 200L))
    assert(c200.getAs[Long]("n_funcs") == 1 && c200.getAs[Long]("n_lib") == 1)
    assert(c200.getAs[Double]("pct_unweighted") == 500.0 / 8.0)
    assert(c200.getAs[Double]("pct_nonlib_unweighted") == 0.0)
  }

  test("cross-compare cells agree with the single-sample 6-weighting rollup") {
    // the cross matrix restricted to one probing sample must count exactly
    // what sixWeightingRollup counts per matched sample (channel counts are
    // exact longs — float percents are covered by the hand-computed test)
    val cross = MatchReportOps.crossCompareWeighted(m).collect()
      .map(r => r.getLong(1) -> r).toMap
    val roll = MatchReportOps.sixWeightingRollup(m).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cross.keySet == roll.keySet)
    for ((ms, c) <- cross) {
      val r = roll(ms)
      assert(c.getAs[Long]("n_funcs") == r.getAs[Long]("n_funcs"), s"n_funcs@$ms")
      assert(c.getAs[Long]("n_pic") == r.getAs[Long]("n_pic"), s"n_pic@$ms")
      assert(c.getAs[Long]("n_min") == r.getAs[Long]("n_min"), s"n_min@$ms")
    }
  }

  test("filter battery: transitive library exclusion and family-unique") {
    val noLib = MatchReportOps.excludeLibraryTransitive(m)
    // fn 2 matched a library sample once → ALL its matches drop
    assert(noLib.where(col("function_id") === 2).count() == 0)
    assert(noLib.count() == 4)
    val uniq = MatchReportOps.uniqueFamilyOnly(m)
    // fn 2 (both matches in family 1) and fn 3 match exactly one family
    assert(uniq.select("function_id").distinct()
      .as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }
}
