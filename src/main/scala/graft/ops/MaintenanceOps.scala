package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index maintenance operators: incremental signature sweep (M7 analog),
  * row-level deletes cascading through derived tables (L5/J6 analog), and
  * per-paragraph content hashing (P2 picblockhash analog).
  */
object MaintenanceOps {

  /** M7 analog — missing-hash sweep: docs in `input` with no row in the
    * signature checkpoint are the only ones signed (anti-join; incremental,
    * resumable). Returns the rows still needing signatures.
    */
  def newDocs(input: DataFrame, signatures: DataFrame, keyCol: String = "url"): DataFrame =
    input.join(signatures.select(keyCol), Seq(keyCol), "left_anti")

  /** Incremental dedup (M7 generalized to pair production, ≅ the
    * reference's addBinarySample → matchSample flow where only the NEW
    * sample is disassembled/hashed): signs ONLY `newDocs` (url, text) —
    * the signature kernel is the pipeline's dominant CPU cost — reuses the
    * persisted signature table for the rest of the corpus, and returns
    * merged-channel dup pairs touching at least one new doc. Pair
    * semantics are EXACTLY the full-batch `dupPairsFromSigs` on the
    * unioned corpus (same caps, same channels — asserted by test), so
    * repeated incremental batches converge to the batch answer. Scale
    * note: banding of old signatures is a cheap explode over the persisted
    * table here; with the band table also persisted (Ledger /
    * band-bucketed Iceberg layout, see `rebuildBandIndex` and
    * `QueryMatch.buildOrLoadIndex`) the old side becomes a co-located read
    * instead.
    */
  def incrementalDupPairs(spark: SparkSession, oldSigs: DataFrame, newDocs: DataFrame,
      cfg: graft.kernel.GraftConfig = graft.kernel.GraftConfig.default,
      opts: graft.pipeline.PipelineOptions = graft.pipeline.PipelineOptions())
      : (DataFrame, DataFrame) = {
    val pipe = new graft.pipeline.DedupPipeline(spark, cfg, opts)
    val newSigs = pipe.signatureStage(pipe.extractStage(newDocs, fromHtml = false))
      .toDF().cache()
    val pairs = pipe.dupPairsFromSigs(oldSigs.unionByName(newSigs))
    val newIds = newSigs.select("doc_id")
    val touchingNew = pairs
      .join(newIds.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
      .unionByName(pairs
        .join(newIds.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
        .join(newIds.withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti"))
    (newSigs, touchingNew)
  }

  /** L5/J6 analog — delete docs: cascade the removal through the signature
    * and band tables (with Iceberg this is `DELETE FROM ... WHERE`; on
    * parquet stand-ins it is a filtering rewrite).
    */
  def deleteDocs(signatures: DataFrame, bands: DataFrame, docIds: Seq[Long])
      : (DataFrame, DataFrame) = {
    val condemned = docIds.toSet
    (signatures.where(!col("doc_id").isInCollection(condemned)),
      bands.where(!col("doc_id").isInCollection(condemned)))
  }

  /** L6 analog — full band-index rebuild from the signature checkpoint
    * (≅ rebuildMinhashBandIndex, MemoryStorage.py:853-878, which drops all
    * band collections and re-adds in packs): one explode over the persisted
    * signature table, co-located on the band key for the probe layout
    * (the Iceberg `band_id, bucket(band_hash)` partitioning analog). Used
    * after a band-config change; the Ledger descriptor then differs, so
    * stale candidate/verify checkpoints invalidate automatically.
    */
  def rebuildBandIndex(spark: SparkSession, signatures: DataFrame,
      cfg: graft.kernel.GraftConfig = graft.kernel.GraftConfig.default,
      numPartitions: Int = 0): DataFrame = {
    val pipe = new graft.pipeline.DedupPipeline(spark, cfg)
    val bands = pipe.bandStage(signatures.where(col("hashable")))
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    bands.repartition(n, col("band_id"), col("band_hash"))
  }

  /** P2 analog — per-paragraph position-independent content hash:
    * (doc_id, para_idx, para_hash). The sub-document exact index that feeds
    * unique-block isolation and pair diffing.
    */
  def paragraphHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n{2,}")).as(Seq("para_idx", "para")))
      .where(length(trim(col("para"))) > 0)
      .select(col("doc_id"), col("para_idx"),
        md5(regexp_replace(lower(trim(col("para"))), "\\s+", " ")).as("para_hash"))

  /** G1/G2 analog — pair diff: which paragraphs two docs share (exact,
    * position-independent), plus G3's fuzzy fallback — best Levenshtein
    * match among unshared paragraphs (built-in levenshtein, bounded by the
    * pair's paragraph counts).
    */
  def pairDiff(spark: SparkSession, docs: DataFrame, idA: Long, idB: Long,
      maxDistance: Int = 10): DataFrame = {
    val paras = docs.where(col("doc_id").isin(idA, idB))
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n{2,}")).as(Seq("para_idx", "para")))
      .withColumn("norm", regexp_replace(lower(trim(col("para"))), "\\s+", " "))
      .where(length(col("norm")) > 0)
      .cache()
    val a = paras.where(col("doc_id") === idA)
      .select(col("para_idx").as("idx_a"), col("norm").as("norm_a"))
    val b = paras.where(col("doc_id") === idB)
      .select(col("para_idx").as("idx_b"), col("norm").as("norm_b"))
    a.crossJoin(b)
      .withColumn("exact", col("norm_a") === col("norm_b"))
      .withColumn("lev", when(col("exact"), 0)
        .otherwise(levenshtein(col("norm_a"), col("norm_b"), maxDistance)))
      .where(col("lev") >= 0 && col("lev") <= maxDistance)
      .select("idx_a", "idx_b", "exact", "lev")
  }
}
