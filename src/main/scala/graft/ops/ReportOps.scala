package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{GraftConfig, KGramShingler, MinHasher, TextNorm}

/** Reporting / characteristic-content analogs of the reference's link-hunt,
  * unique-block and cross-compare layers (SURVEY.md §2.8-2.9).
  */
object ReportOps {

  /** F5 analog — link-hunt compound scoring over verified match pairs:
    * score = (0.1·position_weight + 0.2·min(size,cap)/cap + 0.7·match_score)
    * divided by a polynomial frequency penalty past 3 matched clusters
    * (≅ MatchingResult.getLinkHuntResults,
    * /root/reference/mcrit/storage/MatchingResult.py:413-482; penalty
    * max(1, floor(0.0546n² + 0.370n − 0.171))).
    *
    * Input pairs: (doc_id_a, doc_id_b, score[0..100], size_b tokens).
    */
  def linkHuntScores(pairs: DataFrame, sizeCap: Int = 300): DataFrame = {
    val nMatches = pairs.groupBy("doc_id_a")
      .agg(countDistinct("doc_id_b").as("n_matched"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id_a").orderBy(col("score").desc, col("doc_id_b").asc)
    pairs.join(nMatches, "doc_id_a")
      .withColumn("position", row_number().over(w))
      .withColumn("position_weight", lit(1.0) / col("position"))
      .withColumn("size_weight",
        least(col("size_b"), lit(sizeCap)).cast("double") / lit(sizeCap))
      .withColumn("raw",
        lit(0.1) * col("position_weight") + lit(0.2) * col("size_weight") +
          lit(0.7) * (col("score") / lit(100.0)))
      .withColumn("penalty",
        when(col("n_matched") <= 3, lit(1.0))
          .otherwise(greatest(lit(1.0),
            floor(lit(0.0546) * col("n_matched") * col("n_matched") +
              lit(0.370) * col("n_matched") - lit(0.171)).cast("double"))))
      .withColumn("link_score", col("raw") / col("penalty"))
      .select("doc_id_a", "doc_id_b", "score", "position", "n_matched", "link_score")
  }

  /** distinct k-gram STRINGS per doc — rule rendering wants the actual
    * content (≅ the reference renders YARA rules from real block bytes,
    * UniqueBlocksResult.py:35-128); the dedup channels use the hashed form.
    */
  private def ngramPostings(docs: DataFrame, cfg: GraftConfig): DataFrame = {
    val bcCfg = docs.sparkSession.sparkContext.broadcast(cfg)
    val shUdf = udf((text: String) => {
      val kg = new KGramShingler(bcCfg.value, 1)
      kg.generateSequences(TextNorm.tokenize(if (text == null) "" else text))
        .distinct.toArray
    })
    docs.select(col("doc_id"), explode(shUdf(col("text"))).as("ngram"))
  }

  /** C5 analog — characteristic n-grams: k-grams present in ≥1 target doc
    * and NO non-target doc (groupBy + conditional counts; the "unique
    * block" isolation that feeds rule generation).
    */
  def uniqueNgrams(spark: SparkSession, docs: DataFrame, targetIds: Seq[Long],
      cfg: GraftConfig = GraftConfig.default): DataFrame = {
    val postings = ngramPostings(docs, cfg)
      .withColumn("is_target", col("doc_id").isInCollection(targetIds))
    postings.groupBy("ngram")
      .agg(
        sum(when(col("is_target"), 1).otherwise(0)).as("target_df"),
        sum(when(!col("is_target"), 1).otherwise(0)).as("other_df"),
        collect_set(when(col("is_target"), col("doc_id"))).as("target_docs"))
      .where(col("target_df") >= 1 && col("other_df") === 0)
      .select(col("ngram"), col("target_df").cast("long").as("target_df"),
        col("target_docs"))
  }

  /** C4 analog — greedy multi-set cover over characteristic n-grams: pick
    * n-grams until every target doc is covered `minCover` times (driver-side
    * greedy over the collected candidate aggregate, exactly like the
    * reference's YARA-rule block selection, /root/reference/mcrit/Worker.py:330-390).
    */
  def greedyCover(spark: SparkSession, docs: DataFrame, targetIds: Seq[Long],
      minCover: Int = 3, maxCandidates: Int = 20000,
      cfg: GraftConfig = GraftConfig.default): Seq[(String, Seq[Long])] = {
    val candidates = uniqueNgrams(spark, docs, targetIds, cfg)
      .orderBy(desc("target_df"), asc("ngram"))
      .limit(maxCandidates)
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](2).sorted))
    val need = scala.collection.mutable.Map(targetIds.map(_ -> minCover): _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Long])]
    var progress = true
    while (progress && need.valuesIterator.exists(_ > 0)) {
      progress = false
      // deterministic: best (uncovered-gain, then smallest ngram)
      val best = candidates.iterator
        .filterNot(c => picked.exists(_._1 == c._1))
        .map(c => (c, c._2.count(d => need.getOrElse(d, 0) > 0)))
        .filter(_._2 > 0)
        .reduceOption((a, b) =>
          if (a._2 > b._2 || (a._2 == b._2 && a._1._1 < b._1._1)) a else b)
      best.foreach { case (c, _) =>
        picked += c
        c._2.foreach(d => need.updateWith(d)(_.map(v => math.max(0, v - 1))))
        progress = true
      }
    }
    picked.toSeq
  }

  /** C4 endpoint analog — render a YARA-style rule from the greedy cover's
    * picked n-grams, mirroring the reference's user-visible rule layout
    * (/root/reference/mcrit/storage/UniqueBlocksResult.py:38-70): hash-based
    * rule identifier, meta block, one string per picked gram with a
    * coverage comment, and an `N of them` condition. `date` is an explicit
    * input for deterministic output (the reference stamps utcnow).
    */
  def renderRule(picked: Seq[(String, Seq[Long])], numTargets: Int,
      conditionRequired: Int = 7, date: String = "1970-01-01"): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val ruleId = md.digest(picked.map(_._1).mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    val covered = picked.flatMap(_._2).distinct.size
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val sb = new StringBuilder
    sb ++= s"rule graft_$ruleId {\n"
    sb ++= "    meta:\n"
    sb ++= "        author = \"GRAFT rule generator\"\n"
    sb ++= "        description = \"Text rule composed from characteristic n-grams for the selected document set.\"\n"
    sb ++= s"""        date = "$date"\n"""
    sb ++= "    strings:\n"
    sb ++= s"        // Rule generation selected ${picked.size} n-grams, covering $covered/$numTargets input document(s).\n"
    for (((gram, docs), i) <- picked.zipWithIndex) {
      sb ++= s"        /* ngram coverage: ${docs.size}/$covered document(s). */\n"
      sb ++= s"        $$gram_$i = \"${esc(gram)}\"\n"
    }
    sb ++= "    condition:\n"
    sb ++= s"        ${math.min(picked.size, conditionRequired)} of them\n"
    sb ++= "}\n"
    sb.toString
  }

  /** C3 analog — cross-compare matrix: all-pairs signature scores within a
    * doc set (n is small by contract; the quadratic join is intra-set only).
    */
  def crossCompare(spark: SparkSession, docs: DataFrame, ids: Seq[Long],
      cfg: GraftConfig = GraftConfig.default): DataFrame = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val sigUdf = udf((text: String) => {
      val c = bcCfg.value
      new MinHasher(c).signatureBytes(TextNorm.tokenize(if (text == null) "" else text))
    })
    val subset = docs.where(col("doc_id").isInCollection(ids))
      .select(col("doc_id"), sigUdf(col("text")).as("sig"))
    subset.as("x").join(subset.as("y"), col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        graft.expr.SignatureScore.sigScore(col("x.sig"), col("y.sig")).as("score"))
  }

  /** C2 analog — agglomerative clustering + dendrogram leaf order over a
    * small all-pairs distance matrix (driver-side util,
    * ≅ MatcherCross._compute_serial_matrix with method ∈ {"complete",
    * "ward"}; n ≤ thousands by contract). Linkages via the Lance–Williams
    * recurrence: complete = max of the merged parts; ward on SQUARED
    * distances, d²(i∪j, k) = ((nᵢ+nₖ)d²ᵢₖ + (nⱼ+nₖ)d²ⱼₖ − nₖd²ᵢⱼ) /
    * (nᵢ+nⱼ+nₖ) — the standard minimum-variance update for a Euclidean-ish
    * distance matrix. Deterministic: nearest pair with smallest-(i,j)
    * tie-break; leaf order is the left++right dendrogram traversal.
    * Input: symmetric distances as ((a, b) -> dist). Returns ordered ids.
    */
  def seriation(ids: Seq[Long], dist: (Long, Long) => Double,
      method: String = "complete"): Seq[Long] = {
    require(method == "complete" || method == "ward", s"unknown linkage: $method")
    val sorted = ids.sorted
    val n = sorted.size
    if (n <= 1) return sorted
    // flat n×n double matrix with SLOT REUSE (merged cluster takes the
    // lower slot): the earlier Map[(Int,Int),Double] form allocated a boxed
    // tuple per lookup and scanned all pairs per merge — O(n³) HashMap
    // probes, minutes at the documented "n ≤ thousands" contract. 8·n²
    // bytes of driver heap (72 MB at n = 3000).
    val d = new Array[Double](n * n)
    var i0 = 0
    while (i0 < n) {
      var j0 = i0 + 1
      while (j0 < n) {
        val raw = dist(sorted(i0), sorted(j0))
        val v = if (method == "ward") raw * raw else raw
        d(i0 * n + j0) = v
        d(j0 * n + i0) = v
        j0 += 1
      }
      i0 += 1
    }
    val activeArr = Array.fill(n)(true)
    val sizes = Array.fill(n)(1)
    val members = Array.tabulate(n)(i => Vector(sorted(i)))
    // per-slot nearest-neighbor cache: finding the global closest pair is
    // O(n) per merge instead of O(n²). Valid for complete AND Ward — both
    // are REDUCIBLE linkages (the cluster merged from a mutually-nearest
    // pair never moves CLOSER to any third cluster), so a slot's cached
    // nearest only needs recomputation when it pointed at one of the two
    // merged slots. Ties break toward the smallest slot index (ascending
    // scan + strict <), keeping the traversal deterministic.
    val nearest = new Array[Int](n)
    def recomputeNearest(i: Int): Unit = {
      var best = -1
      var bd = Double.MaxValue
      var j = 0
      while (j < n) {
        if (j != i && activeArr(j) && d(i * n + j) < bd) { bd = d(i * n + j); best = j }
        j += 1
      }
      nearest(i) = best
    }
    var i1 = 0
    while (i1 < n) { recomputeNearest(i1); i1 += 1 }
    var remaining = n
    while (remaining > 1) {
      // global closest pair via the nearest cache; smallest-(lo, hi)
      // slot-pair tie-break keeps the order deterministic
      var bi = -1; var bj = -1
      var bd = Double.MaxValue
      var i = 0
      while (i < n) {
        if (activeArr(i)) {
          val j = nearest(i)
          val dd = d(i * n + j)
          val lo = math.min(i, j); val hi = math.max(i, j)
          if (dd < bd || (dd == bd && (lo < bi || (lo == bi && hi < bj)))) {
            bd = dd; bi = lo; bj = hi
          }
        }
        i += 1
      }
      // Lance-Williams update into slot bi
      var k = 0
      while (k < n) {
        if (k != bi && k != bj && activeArr(k)) {
          val dk =
            if (method == "ward") {
              val ni = sizes(bi); val nj = sizes(bj); val nk = sizes(k)
              ((ni + nk) * d(bi * n + k) + (nj + nk) * d(bj * n + k) -
                nk * d(bi * n + bj)) / (ni + nj + nk).toDouble
            } else math.max(d(bi * n + k), d(bj * n + k))
          d(bi * n + k) = dk
          d(k * n + bi) = dk
        }
        k += 1
      }
      members(bi) = members(bi) ++ members(bj)
      sizes(bi) += sizes(bj)
      activeArr(bj) = false
      remaining -= 1
      if (remaining > 1) {
        recomputeNearest(bi)
        var k2 = 0
        while (k2 < n) {
          if (activeArr(k2) && k2 != bi && (nearest(k2) == bi || nearest(k2) == bj))
            recomputeNearest(k2)
          k2 += 1
        }
      }
    }
    var winner = 0
    while (!activeArr(winner)) winner += 1
    members(winner)
  }
}
