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
