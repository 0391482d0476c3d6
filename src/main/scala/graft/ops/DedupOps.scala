package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel._
import graft.hash.SimHash
import graft.pipeline.{DedupPipeline, PipelineOptions}

/** Deduplication operator family over the `documents` table
  * (doc_id, text, lang, source, n_chars): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. The fuzzy variants run the same kernel/pipeline stages as
  * the web-corpus dedup job, keyed by doc_id instead of url.
  */
object DedupOps {

  /** Exact duplicate groups by normalized-text fingerprint (hash-groupBy). */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextOps.fingerprint(col("text")).as("h"))
      .agg(count(lit(1)).as("cnt"), min("doc_id").as("keep_id"))

  /** Per-doc exact-dup flag: 0 for the kept representative, 1 for dups. */
  def exactDupFlags(docs: DataFrame): DataFrame = {
    val reps = exactDupGroups(docs).select(col("h"), col("keep_id"))
    docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("h"))
      .join(reps, "h")
      .select(col("doc_id"),
        when(col("doc_id") === col("keep_id"), lit(0)).otherwise(lit(1)).as("is_dup"))
  }

  private def asCorpus(docs: DataFrame): DataFrame =
    docs.select(concat(lit("id-"), col("doc_id").cast("string")).as("url"), col("text"))

  /** MinHash+LSH near-dup clusters: (doc_id, cluster_id) with cluster_id
    * being the min doc_id of each near-duplicate component.
    */
  def minhashClusters(spark: SparkSession, docs: DataFrame,
      cfg: GraftConfig = GraftConfig.default,
      opts: PipelineOptions = PipelineOptions()): DataFrame = {
    val pipe = new DedupPipeline(spark, cfg, opts)
    val out = pipe.run(asCorpus(docs), fromHtml = false)
    // map synthetic internal ids back to doc ids via the url key
    out.withColumn("doc_id", expr("cast(substring(url, 4) as long)"))
      .join(out.select(col("cluster_id").as("c2"), col("url").as("u2"))
          .withColumn("cdoc", expr("cast(substring(u2, 4) as long)"))
          .groupBy("c2").agg(min("cdoc").as("cluster_doc_id")),
        col("cluster_id") === col("c2"))
      .select("doc_id", "cluster_doc_id")
  }

  /** Verified near-dup pairs (doc_id_a < doc_id_b, score). */
  def minhashPairs(spark: SparkSession, docs: DataFrame,
      cfg: GraftConfig = GraftConfig.default,
      opts: PipelineOptions = PipelineOptions()): DataFrame = {
    val pipe = new DedupPipeline(spark, cfg, opts)
    // ONE signature pass: the cached table feeds both the id map and the
    // pair pipeline (the earlier form recomputed signatureStage inside
    // dupPairs — paying the dominant CPU cost twice)
    val sigs0 = pipe.signatureStage(pipe.extractStage(asCorpus(docs), fromHtml = false))
      .toDF()
      .withColumn("orig_id", expr("cast(substring(url, 4) as long)"))
      .cache()
    val idMap = sigs0.select("doc_id", "orig_id")
    val pairsRaw = pipe.dupPairsFromSigs(sigs0.drop("orig_id"))
    pairsRaw
      .join(idMap.withColumnRenamed("doc_id", "src").withColumnRenamed("orig_id", "ida"), "src")
      .join(idMap.withColumnRenamed("doc_id", "dst").withColumnRenamed("orig_id", "idb"), "dst")
      .select(least(col("ida"), col("idb")).as("doc_id_a"),
        greatest(col("ida"), col("idb")).as("doc_id_b"), col("score"))
      .distinct()
  }

  /** 64-bit SimHash per doc (k-gram shingles, Charikar bit-voting). */
  def simhash(spark: SparkSession, docs: DataFrame,
      cfg: GraftConfig = GraftConfig.default): DataFrame = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val shUdf = udf((text: String) => {
      val c = bcCfg.value
      val kg = new KGramShingler(c, 1)
      SimHash.of(kg.generateSequences(TextNorm.tokenize(if (text == null) "" else text)))
    })
    docs.select(col("doc_id"), shUdf(col("text")).as("simhash"))
  }

  /** Exact n-gram Jaccard near-dup pairs: inverted-index join on shingles
    * (each doc's distinct k-grams exploded; pairs sharing enough shingles are
    * scored exactly). Scale note: shingle postings are the shuffle key; hot
    * shingles (df > maxPostings — stopword/boilerplate grams) are excluded
    * from the quadratic postings join like LSH stop-bands, but the score
    * stays EXACT: each doc carries its (small) sorted set of hot shingles,
    * and a pair's hot-side intersection is recomputed per candidate with
    * array_intersect, so |A∩B| = inter_cold + inter_hot exactly. (The old
    * form dropped hot shingles from the numerator but not the denominator —
    * a silent underestimate biased exactly against boilerplate-heavy pairs.)
    *
    * Residual by design: a pair whose ENTIRE overlap is hot shingles is
    * never discovered — that is the stop-shingle policy itself (such overlap
    * is corpus-wide boilerplate, and scoring it would need the quadratic
    * join the cap exists to prevent).
    */
  def ngramJaccardPairs(spark: SparkSession, docs: DataFrame,
      k: Int = 3, threshold: Double = 0.7, maxPostings: Int = 1000): DataFrame = {
    import spark.implicits._
    val cfg = GraftConfig.default.copy(kGram = k)
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val shUdf = udf((text: String) => {
      val c = bcCfg.value
      val kg = new KGramShingler(c, 1)
      kg.generateSequences(TextNorm.tokenize(if (text == null) "" else text))
        .distinct.map(graft.hash.Murmur3.hashU(_, 0)).toArray
    })
    val sets = docs.select(col("doc_id"), shUdf(col("text")).as("shingles"))
      .withColumn("set_size", size(col("shingles")))
      .where(col("set_size") > 0)
      .cache()
    val postings = sets.select(col("doc_id"), col("set_size"), explode(col("shingles")).as("sh"))
    // cap hot shingles (stopword grams) — same stop-band policy as LSH
    val hot = postings.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") > maxPostings)
    val cold = postings.join(hot.select("sh"), Seq("sh"), "left_anti")
    // per-doc hot-shingle sets: bounded by the number of DISTINCT hot
    // shingles a doc contains (tiny — global hot count ≤ totalPostings /
    // maxPostings), grouped on the same doc_id key the pair rollup uses
    val hotPerDoc = postings.join(hot.select("sh"), Seq("sh"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("sh"))).as("hot_set"))
    val inter = cold.as("x").join(cold.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        col("x.set_size").as("size_a"), col("y.set_size").as("size_b"))
      .agg(count(lit(1)).as("inter_cold"))
    val withHot = inter
      .join(hotPerDoc.select(col("doc_id").as("doc_id_a"), col("hot_set").as("hot_a")),
        Seq("doc_id_a"), "left")
      .join(hotPerDoc.select(col("doc_id").as("doc_id_b"), col("hot_set").as("hot_b")),
        Seq("doc_id_b"), "left")
      .withColumn("inter_hot",
        when(col("hot_a").isNull || col("hot_b").isNull, lit(0))
          .otherwise(size(array_intersect(col("hot_a"), col("hot_b")))))
    withHot.withColumn("jaccard",
        (col("inter_cold") + col("inter_hot")).cast("double") /
          (col("size_a") + col("size_b") - col("inter_cold") - col("inter_hot")))
      .where(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }
}
