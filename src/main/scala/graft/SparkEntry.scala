package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.pipeline.{DedupPipeline, PipelineOptions}
import graft.corpus.CorpusGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator family (SURVEY.md §2
  * mapping + the training-data-pipeline ops). Each SQL-expressible query has
  * a DuckDB oracle in `oracleSql` with IDENTICAL column names and types
  * (bigint/double/string — float sums avoided or made engine-exact via
  * decimal arithmetic or integer scaling).
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship: full near-dup pipeline (extract → minhash+simhash → LSH →
    * verify → connected components) on a small deterministic synthetic
    * web corpus; returns (url, doc_id, cluster_id).
    */
  def entry(spark: SparkSession): DataFrame = {
    val corpus = CorpusGen.generate(spark, sf = 0.002, seed = 42L)
    val pipe = new DedupPipeline(spark)
    pipe.run(corpus, fromHtml = true)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup: exact channel (S1/P3/V6 analogs) ----
    "q_exact_dedup_groups" -> ((s, dir) => DedupOps.exactDupGroups(docs(s, dir))),
    "q_exact_dedup_flags" -> ((s, dir) => DedupOps.exactDupFlags(docs(s, dir))),
    // ---- dedup: fuzzy channels (SH1/M3/L2/L4/V3/C1 analogs) ----
    "q_minhash_clusters" -> ((s, dir) => DedupOps.minhashClusters(s, docs(s, dir))),
    "q_minhash_pairs" -> ((s, dir) => DedupOps.minhashPairs(s, docs(s, dir))),
    "q_simhash" -> ((s, dir) => DedupOps.simhash(s, docs(s, dir))),
    "q_ngram_jaccard" -> ((s, dir) => DedupOps.ngramJaccardPairs(s, docs(s, dir), threshold = 0.5)),
    // ---- text analysis ----
    "q_token_count" -> ((s, dir) => docs(s, dir).select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))),
    "q_doc_quality" -> ((s, dir) => TextOps.qualityStats(docs(s, dir))
      .select(col("doc_id"), col("n_chars_calc").cast("long").as("n_chars_calc"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("avg_token_len_x1000"), col("punct_ratio_x1000"))),
    "q_fingerprint" -> ((s, dir) => docs(s, dir).select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))),
    "q_langid" -> ((s, dir) => TextOps.withLangId(docs(s, dir)).select("doc_id", "lang_pred")),
    "q_lang_dist" -> ((s, dir) => docs(s, dir).groupBy("lang")
      .agg(count(lit(1)).as("cnt"))),
    // ---- search query language (Q1-Q3 analogs) ----
    "q_search" -> ((s, dir) => docs(s, dir)
      .where(SearchQuery.predicate("lang:en AND n_chars:>300",
        defaultFields = Seq("text"), numericFields = Set("n_chars", "doc_id")))
      .select("doc_id")),
    // ---- similarity search over embeddings ----
    "q_ann_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      AnnOps.bruteForceTopK(e.where(col("vec_id") < 20), e, k = 5)
        .select("query_id", "neighbor_id", "rank")
    }),
    "q_ann_lsh" -> ((s, dir) => AnnOps.lshTopK(emb(s, dir), k = 5)
      .select("query_id", "neighbor_id", "rank")),
    "q_cosine_dups" -> ((s, dir) => AnnOps.cosineDupPairs(emb(s, dir), threshold = 0.4)
      .select("vec_id_a", "vec_id_b")),
    // ---- substring / reporting / multimodal ----
    "q_substring" -> ((s, dir) => graft.substring.SubstringStage.run(
      s, docs(s, dir).select("doc_id", "text"), window = 8, winnow = 4,
      maxAnchorGroup = 200, minRun = 11)),
    "q_linkhunt" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = DedupOps.minhashPairs(s, d)
      val sizes = d.select(col("doc_id").as("doc_id_b"),
        TextOps.tokenCount(col("text")).as("size_b"))
      ReportOps.linkHuntScores(pairs.join(sizes, "doc_id_b"))
    }),
    "q_unique_ngrams" -> ((s, dir) => ReportOps.uniqueNgrams(
      s, docs(s, dir), targetIds = Seq(0L, 1L, 2L, 3L, 4L))
      .select("ngram", "target_df")),
    "q_cross_compare" -> ((s, dir) => ReportOps.crossCompare(
      s, docs(s, dir), ids = (0L until 10L))),
    "q_media_features" -> ((s, _) => MultimodalOps.extractFeatures(
      MultimodalOps.syntheticMedia(s, 500)).toDF()
      .select("media_id", "kind", "byte_len", "phash")),
    "q_media_frames" -> ((s, _) => MultimodalOps.sampleFrames(
      MultimodalOps.syntheticMedia(s, 500)).toDF()),
    "q_phash_dups" -> ((s, _) => {
      import s.implicits._
      // media corpus with injected duplicates (ids 10000+i duplicate i)
      val base = MultimodalOps.syntheticMedia(s, 500)
      val dups = base.filter(_.media_id < 20).map(m => m.copy(media_id = m.media_id + 10000))
      MultimodalOps.phashDupPairs(
        MultimodalOps.extractFeatures(base.union(dups)).toDF(), maxHamming = 4)
    }),
    "q_query_match" -> ((s, dir) => {
      val d = docs(s, dir)
      // query = text of doc 0 → must match itself (and any near-dups)
      val queryText = d.where(col("doc_id") === 0).select("text")
        .collect()(0).getString(0)
      QueryMatch.topMatches(s, d.select(
        concat(lit("id-"), col("doc_id")).as("url"), col("text")), queryText, k = 10)
    }),
    "q_para_hash" -> ((s, dir) => MaintenanceOps.paragraphHashes(docs(s, dir))),
    // ---- relational analogs (A1-A3/V4/F1-F7) ----
    "q_agg_rollup" -> ((s, dir) => RelOps.aggRollup(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_base_price").cast("double").as("sum_base_price"),
        col("count_order"))),
    "q_argmax" -> ((s, dir) => RelOps.argmaxPerCustomer(s, dir)),
    "q_top_per_group" -> ((s, dir) => RelOps.topPerGroup(s, dir)),
    "q_filter_battery" -> ((s, dir) => RelOps.filterBattery(s, dir)
      .select(col("o_custkey"), col("cnt"), col("total").cast("double").as("total"))),
    "q_keyset_page" -> ((s, dir) => RelOps.keysetPage(s, dir)),
    "q_freq_penalty" -> ((s, dir) => RelOps.frequencyPenalty(s, dir)),
    "q_event_window" -> ((s, dir) => RelOps.eventWindowAgg(s, dir)),
    "q_unique_score" -> ((s, dir) => RelOps.uniqueScore(s, dir))
  )

  private val Fp = raw"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"

  def oracleSql: Map[String, String] = Map(
    "q_exact_dedup_groups" ->
      s"SELECT $Fp AS h, count(*) AS cnt, min(doc_id) AS keep_id FROM documents GROUP BY 1",
    "q_exact_dedup_flags" ->
      (s"WITH f AS (SELECT doc_id, $Fp AS h FROM documents), " +
        "r AS (SELECT h, min(doc_id) AS keep_id FROM f GROUP BY 1) " +
        "SELECT f.doc_id, CASE WHEN f.doc_id = r.keep_id THEN 0 ELSE 1 END AS is_dup " +
        "FROM f JOIN r ON f.h = r.h"),
    "q_token_count" ->
      raw"SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_tokens FROM documents",
    "q_doc_quality" ->
      (raw"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc, " +
        raw"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_tokens, " +
        raw"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(floor(1000 * (CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / length(string_split_regex(trim(text), '\s+')))) AS BIGINT) END AS avg_token_len_x1000, " +
        raw"CAST(floor(1000 * (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))) AS BIGINT) AS punct_ratio_x1000 " +
        "FROM documents"),
    "q_fingerprint" -> s"SELECT doc_id, $Fp AS fp FROM documents",
    "q_para_hash" ->
      (raw"SELECT doc_id, CAST(i - 1 AS INT) AS para_idx, " +
        raw"md5(regexp_replace(lower(trim(p)), '\s+', ' ', 'g')) AS para_hash FROM (" +
        raw"SELECT doc_id, unnest(string_split_regex(text, '\n{2,}')) AS p, " +
        raw"generate_subscripts(string_split_regex(text, '\n{2,}'), 1) AS i " +
        "FROM documents) WHERE length(trim(p)) > 0"),
    "q_lang_dist" -> "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang",
    "q_search" -> "SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars > 300",
    "q_agg_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q_argmax" ->
      ("WITH m AS (SELECT o_custkey, max(o_totalprice) AS max_price FROM orders GROUP BY 1) " +
        "SELECT o.o_custkey, m.max_price, min(o.o_orderkey) AS best_order " +
        "FROM orders o JOIN m ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.max_price " +
        "GROUP BY o.o_custkey, m.max_price"),
    "q_top_per_group" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) WHERE rn = 1"),
    "q_filter_battery" ->
      ("SELECT o_custkey, count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000 " +
        "GROUP BY o_custkey HAVING count(*) >= 2"),
    "q_keyset_page" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > 5000.0 OR (o_totalprice = 5000.0 AND o_orderkey > 0) " +
        "ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 20"),
    "q_freq_penalty" ->
      ("SELECT o_custkey, n, CASE WHEN n < 3 THEN 1 WHEN n < 4 THEN 2 WHEN n < 8 THEN 3 " +
        "WHEN n < 16 THEN 4 WHEN n < 32 THEN 5 WHEN n < 64 THEN 6 WHEN n < 128 THEN 7 ELSE 8 END AS adjustment " +
        "FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)"),
    "q_event_window" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w, " +
        "event_type, count(*) AS cnt, " +
        "max(value) AS max_value, min(value) AS min_value " +
        "FROM events GROUP BY 1, 2"),
    "q_unique_score" ->
      ("SELECT l_orderkey, count(*) AS n_lines, " +
        "CAST(sum(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_parts FROM (" +
        "SELECT li.l_orderkey, po.n_orders FROM lineitem li JOIN (" +
        "SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders FROM lineitem GROUP BY 1" +
        ") po ON li.l_partkey = po.l_partkey) GROUP BY l_orderkey")
  )
}
