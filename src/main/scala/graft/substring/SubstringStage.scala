package graft.substring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.TextNorm
import graft.hash.Murmur3

/** Near-verbatim excerpt detection — the scalable analog of the reference's
  * per-pair block matching (G1-G3, /root/reference/mcrit/matchers/FunctionCfgMatcher.py)
  * and the north_rule "suffix-array substring stage catches near-verbatim
  * excerpts LSH misses": long shared token runs between documents whose
  * overall similarity is below LSH thresholds (e.g. a quoted article inside
  * an otherwise-different page).
  *
  * Candidate generation: Rabin-Karp-style anchors — the rolling hash of
  * every stride-aligned `window`-token run; documents sharing an anchor hash
  * share (whp) a verbatim `window`-token run. `groupBy(anchor)` is the
  * shuffle; hot anchors (boilerplate) capped exactly like LSH stop-bands.
  *
  * Verification: per candidate pair, the exact longest common token run via
  * a suffix array over the two token sequences (memory bounded per pair, not
  * per partition).
  */
object SubstringStage {

  /** token-hash sequence of a doc, masked to 31 bits (separator-safe). */
  def tokenHashes(text: String): Array[Int] = {
    val tok = TextNorm.tokenize(text)
    tok.allTokens.map(t => (Murmur3.hashU(t, 0) & 0x7fffffffL).toInt).toArray
  }

  /** polynomial rolling hashes of each stride-aligned window. */
  def anchors(hashes: Array[Int], window: Int, stride: Int): Array[(Long, Int)] = {
    if (hashes.length < window) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var start = 0
    while (start + window <= hashes.length) {
      var h = 1125899906842597L
      var i = start
      while (i < start + window) { h = h * 31 + hashes(i); i += 1 }
      out += ((h, start))
      start += stride
    }
    out.toArray
  }

  /** Pairs of docs sharing a ≥`window`-token verbatim run, with the exact
    * longest common run length from suffix-array verification.
    * Input: (doc_id: Long, text: String).
    */
  def run(spark: SparkSession, docs: DataFrame,
      window: Int = 40, stride: Int = 20,
      maxAnchorGroup: Int = 200, minRun: Int = 40): DataFrame = {
    import spark.implicits._

    val hashed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, tokenHashes(text)) }
      .toDF("doc_id", "hashes")
      .where(size(col("hashes")) >= window)
      .cache()

    val w = window; val st = stride
    val anchorRows = hashed.as[(Long, Array[Int])]
      .flatMap { case (id, hs) => anchors(hs, w, st).map { case (a, _) => (a, id) } }
      .toDF("anchor", "doc_id")
      .distinct()

    // candidate pairs from shared anchors; stop-anchor cap for boilerplate
    val cap = maxAnchorGroup
    val pairs = anchorRows.as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, rows: Iterator[(Long, Long)]) =>
        val ids = rows.map(_._2).toArray.distinct.sorted
        if (ids.length < 2 || ids.length > cap) Iterator.empty
        else for { i <- ids.indices.iterator; j <- (i + 1) until ids.length }
          yield (ids(i), ids(j))
      }
      .toDF("a", "b")
      .distinct()

    // exact verification: suffix-array longest common run per pair
    val joined = pairs
      .join(hashed.withColumnRenamed("doc_id", "a").withColumnRenamed("hashes", "h_a"), "a")
      .join(hashed.withColumnRenamed("doc_id", "b").withColumnRenamed("hashes", "h_b"), "b")
    val mr = minRun
    joined.select(col("a"), col("b"), col("h_a"), col("h_b"))
      .as[(Long, Long, Array[Int], Array[Int])]
      .map { case (a, b, ha, hb) =>
        val (len, pa, pb) = SuffixArray.longestCommonRun(ha, hb)
        (a, b, len, pa, pb)
      }
      .toDF("doc_id_a", "doc_id_b", "run_tokens", "offset_a", "offset_b")
      .where(col("run_tokens") >= mr)
  }
}
