package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reference-shaped match reporting: the per-sample 6-weighting rollup and
  * the composable filter battery over a standard match-row table
  *
  *   (sample_id, function_id, binweight,
  *    matched_family_id, matched_sample_id, score, is_library,
  *    is_pichash, is_minhash)
  *
  * ≅ /root/reference/mcrit/matchers/MatcherInterface.py:442-531
  * (_aggregateMatchSampleSummary) and
  * /root/reference/mcrit/storage/MatchingResult.py:86-281 (applyFilterValues
  * and the 15 named filters). All plain Catalyst: window counts + joins, no
  * UDFs, so the filters compose and push down.
  */
object MatchReportOps {

  /** A2 frequency penalty: 1 if a function matched < 3 families, else
    * 1 + floor(log2(n)) — computed as the bit length of n (`length(bin(n))`),
    * which is engine-exact integer arithmetic (no float log) and follows the
    * reference's UNBOUNDED ladder (9 at 256 families, 10 at 512, …) instead
    * of the old hard cap of 8 at 128. ≅ MatcherInterface._get_family_adjustment
    * (/root/reference/mcrit/matchers/MatcherInterface.py:435-441).
    * The only remaining clamp is 12 (binds from 4096 distinct families per
    * function) so the exact integer scaling below stays within `AdjLcm`;
    * beyond that the penalty saturates — documented deviation.
    */
  def familyAdjustment(nFamilies: Column): Column =
    when(nFamilies < 3, lit(1))
      .otherwise(least(length(bin(nFamilies.cast("long"))), lit(12)).cast("int"))

  /** least common multiple of the adjustment range {1..12}: weighted sums are
    * computed as exact integer sums of binweight·score·27720/adjustment and
    * divided back out only at the end — one deterministic double division
    * instead of an order-sensitive float sum. Overflow headroom: a row
    * contributes ≤ binweight·100·27720 ≈ 2.8e12 at binweight 1e6, so a
    * single sample overflows Long only past ~3×10^6 matched functions —
    * far beyond the data model.
    */
  private val AdjLcm = 27720L

  /** A3 analog — per matched sample, matched bytes under the 6 weightings
    * (unweighted / score-weighted / frequency-weighted) × (all / nonlib),
    * plus match counts by channel. Two-level aggregation: per
    * (function, matched sample) best match first (the reference's per-entry
    * argmax), then the sample rollup.
    *
    * Expects integer `binweight` and integer `score` in [0, 100].
    */
  def sixWeightingRollup(matches: DataFrame): DataFrame = {
    // adjustment is per FUNCTION over all its matches (promiscuity penalty)
    val famCounts = matches.groupBy("function_id")
      .agg(countDistinct("matched_family_id").as("n_families"))
      .select(col("function_id"), familyAdjustment(col("n_families")).as("adjustment"))

    // best match per (function, matched sample): max score, any-channel flags
    val best = matches.groupBy("function_id", "matched_sample_id")
      .agg(
        max("score").as("score"),
        first("binweight").as("binweight"),
        max(col("is_pichash").cast("int")).as("is_pic"),
        max(col("is_minhash").cast("int")).as("is_min"),
        max(col("is_library").cast("int")).as("is_lib"))
      .join(famCounts, "function_id")

    val w = col("binweight").cast("long")
    val weighted = w * col("score").cast("long") // exact: ≤ 100·binweight
    // integer DIV (not `/`, which is double in Spark SQL): 27720 = lcm(1..12)
    // is divisible by every clamped adjustment in {1..12}, so this stays exact
    val freqWeighted = expr(
      "(CAST(binweight AS BIGINT) * CAST(score AS BIGINT) * 27720) DIV CAST(adjustment AS BIGINT)")
    val nonlib = col("is_lib") === 0

    best.groupBy("matched_sample_id")
      .agg(
        count(lit(1)).as("n_funcs"),
        sum(col("is_pic")).cast("long").as("n_pic"),
        sum(col("is_min")).cast("long").as("n_min"),
        // unweighted / score-weighted / frequency-weighted — all docs
        sum(w).cast("long").as("bytes_all"),
        (sum(weighted).cast("double") / 100.0).as("bytes_score_all"),
        (sum(freqWeighted).cast("double") / (100.0 * AdjLcm)).as("bytes_freq_all"),
        // the same three, library matches excluded
        sum(when(nonlib, w).otherwise(0L)).cast("long").as("bytes_nonlib"),
        (sum(when(nonlib, weighted).otherwise(0L)).cast("double") / 100.0)
          .as("bytes_score_nonlib"),
        (sum(when(nonlib, freqWeighted).otherwise(0L)).cast("double") / (100.0 * AdjLcm))
          .as("bytes_freq_nonlib"))
  }

  /** C3×A3 — the cross-compare matrix cell the reference renders: per
    * (probing sample, matched sample), matched-function counts by channel
    * and matched PERCENT under all 6 weightings ((unweighted / score /
    * frequency) × (all / nonlib)), ≅ MatcherCross._produce_cross_crompare
    * over per-sample 1vsN reports (/root/reference/mcrit/matchers/
    * MatcherCross.py:79-151) with the percent math of
    * _aggregateMatchSampleSummary (MatcherInterface.py:442-531):
    *
    *   percent[kind]          = 100 · bytes[kind] / matchable_bytes(sample)
    *   percent[nonlib_kind]   = 100 · bytes[nonlib_kind] /
    *                              (matchable_bytes − library_match_bytes)
    *
    * where library_match_bytes counts each function that matched ANY library
    * sample anywhere in the sample's report (the reference's
    * num_library_match_bytes), while the nonlib NUMERATOR excludes a
    * function only for matched samples it reached through a library match
    * (per-pair has_library_match) — the same asymmetry the reference has.
    *
    * `sampleFunctions` (sample_id, function_id, binweight) supplies the
    * denominators; the overload derives it from the match rows (every
    * matchable function appears there by construction of a full report).
    * All weighted sums use the exact integer scaling of
    * `sixWeightingRollup`; the only float ops are the two final divisions,
    * in a fixed tree, so a SQL oracle reproduces them bit-for-bit.
    */
  def crossCompareWeighted(matches: DataFrame, sampleFunctions: DataFrame): DataFrame = {
    // family-promiscuity adjustment per (sample, function) over its matches
    val famCounts = matches.groupBy("sample_id", "function_id")
      .agg(countDistinct("matched_family_id").as("n_families"))
      .select(col("sample_id"), col("function_id"),
        familyAdjustment(col("n_families")).as("adjustment"))

    // per-function library flag across the WHOLE report (denominator side)
    val libFuncs = matches.groupBy("sample_id", "function_id")
      .agg(max(col("is_library").cast("int")).as("fn_is_lib"))

    // denominators per probing sample
    val denoms = sampleFunctions
      .join(libFuncs, Seq("sample_id", "function_id"), "left")
      .na.fill(0, Seq("fn_is_lib"))
      .groupBy("sample_id")
      .agg(sum(col("binweight").cast("long")).as("total_bytes"),
        sum(when(col("fn_is_lib") === 0, col("binweight").cast("long")).otherwise(0L))
          .as("nonlib_total_bytes"))

    // best match per (sample, function, matched sample): the reference's
    // per-entry argmax with any-channel flags
    val best = matches.groupBy("sample_id", "function_id", "matched_sample_id")
      .agg(
        max("score").as("score"),
        first("binweight").as("binweight"),
        max(col("is_pichash").cast("int")).as("is_pic"),
        max(col("is_minhash").cast("int")).as("is_min"),
        max(col("is_library").cast("int")).as("is_lib"))
      .join(famCounts, Seq("sample_id", "function_id"))

    val w = col("binweight").cast("long")
    val weighted = w * col("score").cast("long")
    val freqWeighted = expr(
      "(CAST(binweight AS BIGINT) * CAST(score AS BIGINT) * 27720) DIV CAST(adjustment AS BIGINT)")
    val nonlib = col("is_lib") === 0

    val cells = best.groupBy("sample_id", "matched_sample_id")
      .agg(
        count(lit(1)).as("n_funcs"),
        sum(col("is_pic")).cast("long").as("n_pic"),
        sum(col("is_min")).cast("long").as("n_min"),
        sum(col("is_lib")).cast("long").as("n_lib"),
        sum(w).cast("long").as("b_unw"),
        sum(weighted).cast("long").as("b_sw"),
        sum(freqWeighted).cast("long").as("b_fw"),
        sum(when(nonlib, w).otherwise(0L)).cast("long").as("b_nl_unw"),
        sum(when(nonlib, weighted).otherwise(0L)).cast("long").as("b_nl_sw"),
        sum(when(nonlib, freqWeighted).otherwise(0L)).cast("long").as("b_nl_fw"))

    def pct(bytesInt: Column, scale: Double, denom: Column): Column =
      when(denom > 0,
        (lit(100.0) * (bytesInt.cast("double") / lit(scale))) / denom.cast("double"))
        .otherwise(lit(0.0))

    cells.join(denoms, "sample_id")
      .select(col("sample_id"), col("matched_sample_id"),
        col("n_funcs"), col("n_pic"), col("n_min"), col("n_lib"),
        pct(col("b_unw"), 1.0, col("total_bytes")).as("pct_unweighted"),
        pct(col("b_sw"), 100.0, col("total_bytes")).as("pct_score_weighted"),
        pct(col("b_fw"), 100.0 * AdjLcm, col("total_bytes")).as("pct_frequency_weighted"),
        pct(col("b_nl_unw"), 1.0, col("nonlib_total_bytes")).as("pct_nonlib_unweighted"),
        pct(col("b_nl_sw"), 100.0, col("nonlib_total_bytes")).as("pct_nonlib_score_weighted"),
        pct(col("b_nl_fw"), 100.0 * AdjLcm, col("nonlib_total_bytes"))
          .as("pct_nonlib_frequency_weighted"))
  }

  /** Convenience form: denominators from the distinct functions present in
    * the match rows themselves.
    */
  def crossCompareWeighted(matches: DataFrame): DataFrame =
    crossCompareWeighted(matches,
      matches.select("sample_id", "function_id", "binweight").distinct())

  // ---- F1 filter battery (composable, named like the reference's) -------

  /** filterByDirectMinScore / MaxScore (MatchingResult.py:137-158). */
  def minScore(m: DataFrame, s: Double): DataFrame = m.where(col("score") >= s)
  def maxScore(m: DataFrame, s: Double): DataFrame = m.where(col("score") <= s)

  /** excludeOwnFamily (MatchingResult.py:186-196): drop matches into the
    * sample's own family.
    */
  def excludeOwnFamily(m: DataFrame, ownFamilyId: Long): DataFrame =
    m.where(col("matched_family_id") =!= ownFamilyId)

  /** filterByFamilyName contains (MatchingResult.py:160-172). */
  def familyNameContains(m: DataFrame, needle: String): DataFrame =
    m.where(col("family_name").contains(needle))

  /** excludeLibraryMatches, TRANSITIVE form (MatchingResult.py:198-220):
    * drop every match of any FUNCTION that matched at least one library
    * sample — not just the library rows themselves (a function that matches
    * a library is itself library code whatever else it matches).
    */
  def excludeLibraryTransitive(m: DataFrame): DataFrame = {
    val w = Window.partitionBy("function_id")
    m.withColumn("_any_lib", max(col("is_library").cast("int")).over(w))
      .where(col("_any_lib") === 0)
      .drop("_any_lib")
  }

  /** excludePicHashMatches (MatchingResult.py:174-184). */
  def excludePichash(m: DataFrame): DataFrame = m.where(!col("is_pichash"))

  /** filterToSampleCount: keep functions matched by ≥ lo and ≤ hi distinct
    * samples (MatchingResult.py:222-234) — a HAVING over a window count.
    */
  def sampleCountBetween(m: DataFrame, lo: Int, hi: Int): DataFrame = {
    val w = Window.partitionBy("function_id")
    m.withColumn("_ns", size(collect_set("matched_sample_id").over(w)))
      .where(col("_ns") >= lo && col("_ns") <= hi)
      .drop("_ns")
  }

  /** filterToFamilyCount ceiling (MatchingResult.py:236-245). */
  def maxFamiliesMatched(m: DataFrame, hi: Int): DataFrame = {
    val w = Window.partitionBy("function_id")
    m.withColumn("_nf", size(collect_set("matched_family_id").over(w)))
      .where(col("_nf") <= hi)
      .drop("_nf")
  }

  /** unique-only (family-unique) filter (MatchingResult.py:247-281): keep
    * only functions whose matches all land in exactly one family.
    */
  def uniqueFamilyOnly(m: DataFrame): DataFrame = maxFamiliesMatched(m, 1)

  /** F4 — per-function aggregation view (MatchingResult.py:368-408): best
    * score, distinct families/samples matched, counts by channel flag.
    */
  def functionAggView(m: DataFrame): DataFrame =
    m.groupBy("function_id")
      .agg(
        max("score").as("best_score"),
        countDistinct("matched_family_id").as("n_families"),
        countDistinct("matched_sample_id").as("n_samples"),
        sum(when(col("is_pichash"), 1).otherwise(0)).cast("long").as("n_pic"),
        sum(when(col("is_minhash"), 1).otherwise(0)).cast("long").as("n_min"),
        sum(when(col("is_library"), 1).otherwise(0)).cast("long").as("n_lib"))
}
