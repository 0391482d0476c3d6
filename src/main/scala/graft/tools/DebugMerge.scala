package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen
import graft.pipeline.{DedupPipeline, PipelineOptions}

/** Scratch diagnostics for cluster over-merge (not part of the library API). */
object DebugMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = CorpusGen.generate(spark, 0.01, 42L).cache()
    val pipe = new DedupPipeline(spark)
    val pairs = pipe.dupPairs(corpus, fromHtml = true).cache()

    val gold = pipe.signatureStage(pipe.extractStage(corpus, fromHtml = true)).toDF()
      .select("doc_id", "url")
      .join(corpus.select("url", "cluster_gold"), "url")
      .select(col("doc_id"), col("cluster_gold"))

    val cross = pairs
      .join(gold.withColumnRenamed("doc_id", "src").withColumnRenamed("cluster_gold", "g_a"), "src")
      .join(gold.withColumnRenamed("doc_id", "dst").withColumnRenamed("cluster_gold", "g_b"), "dst")
      .where(col("g_a") =!= col("g_b"))
      .cache()
    println(s"total pairs: ${pairs.count()}, cross-gold pairs: ${cross.count()}")
    cross.orderBy(desc("score")).show(30, truncate = false)
    println("hamming distribution of cross-gold pairs:")
    cross.groupBy("hamming").count().orderBy("hamming").show(70)
    println("hamming distribution of all pairs:")
    pairs.groupBy("hamming").count().orderBy("hamming").show(70)

    // which channel produced them?
    val urls = pipe.signatureStage(pipe.extractStage(corpus, fromHtml = true)).toDF()
      .select("doc_id", "url", "n_tokens")
    cross.join(urls.withColumnRenamed("doc_id", "src")
        .withColumnRenamed("url", "url_a").withColumnRenamed("n_tokens", "nt_a"), "src")
      .join(urls.withColumnRenamed("doc_id", "dst")
        .withColumnRenamed("url", "url_b").withColumnRenamed("nt_b", "nt_b")
        .withColumnRenamed("n_tokens", "nt_b"), "dst")
      .select("url_a", "url_b", "score", "nt_a", "nt_b")
      .show(40, truncate = false)
    spark.stop()
  }
}
