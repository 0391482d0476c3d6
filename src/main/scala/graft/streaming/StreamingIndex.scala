package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{Bands, GraftConfig, KGramShingler, MinHasher}
import graft.pipeline.DocSig

/** Structured-Streaming incremental indexing — the streaming form of the
  * reference's missing-hash sweep (M7, /root/reference/mcrit/Worker.py:281-312):
  * new documents arrive on a stream, are signed with the identical per-doc
  * feature computation as the batch pipeline, and their band postings are
  * appended to the band table. The batch candidate/verify stages then probe
  * the grown table — no full rebuild.
  *
  * Also provides the event-time windowed aggregation shape (watermark +
  * tumbling window) over an event stream.
  */
object StreamingIndex {

  /** Streaming (url, text) → DocSig rows; works on any streaming DataFrame
    * with those two columns (file source, Kafka value parse, MemoryStream).
    */
  def signatureStream(spark: SparkSession, docs: DataFrame,
      cfg: GraftConfig = GraftConfig.default): Dataset[DocSig] = {
    import spark.implicits._
    val bcCfg = spark.sparkContext.broadcast(cfg)
    docs.select("url", "text").as[(String, String)].mapPartitions { it =>
      val k = new DocSig.Kernel(bcCfg.value)
      it.map { case (url, text) => k.compute(url, text) }
    }
  }

  /** Streaming band postings (band_id, band_hash, doc_id) for hashable docs
    * — append-mode sink rows for the band table.
    */
  def bandPostingsStream(spark: SparkSession, docs: DataFrame,
      cfg: GraftConfig = GraftConfig.default): DataFrame = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val bandsUdf = udf((sig: Array[Byte]) => {
      val c = bcCfg.value
      new Bands(c).bandHashes(new MinHasher(c).unpack(sig))
    })
    signatureStream(spark, docs, cfg).toDF()
      .where(col("hashable"))
      .select(col("doc_id"), posexplode(bandsUdf(col("sig"))).as(Seq("band_id", "band_hash")))
  }

  /** Event-time tumbling-window aggregation with watermark over a stream of
    * (ts: timestamp, event_type: string, value: double).
    */
  def eventWindowStream(events: DataFrame,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), max("value").as("max_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("max_value"))
}
