package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{DedupPipeline, PipelineOptions}
import graft.ledger.Ledger
import graft.kernel.GraftConfig

/** The spark-submit entry point for the end-to-end dedup job (the
  * north_rule's production surface):
  *
  *   spark-submit --class graft.DedupJob <jar> \
  *     --input  <parquet path of (url, warc_ts, html, text, lang)> \
  *     --output <parquet dir for (url, doc_id, cluster_id)> \
  *     [--checkpoint <ledger dir>]   resumable stage checkpoints + lineage
  *     [--text-only]                 trust the text column (skip extraction)
  *     [--jaccard-verify]            exact k-gram Jaccard after signature verify
  *     [--hot-band-prefilter]        two-phase heavy-hitter exclusion
  *     [--max-band-group <n>]        stop-band cap (default 500)
  *
  * Master/executors/shuffle-partitions come from spark-submit / cluster
  * conf as usual (`getOrCreate` — no hardcoded master). With --checkpoint
  * the run resumes mid-pipeline after a kill: completed stages are read
  * back from their committed parquet, and per-partition lineage + metrics
  * accumulate under `<checkpoint>/_lineage` and `_metrics`.
  */
object DedupJob {

  final case class Args(input: String = null, output: String = null,
      checkpoint: Option[String] = None, fromHtml: Boolean = true,
      opts: PipelineOptions = PipelineOptions())

  private[graft] def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--checkpoint" => a = a.copy(checkpoint = Some(argv(i + 1))); i += 2
        case "--text-only" => a = a.copy(fromHtml = false); i += 1
        case "--jaccard-verify" =>
          a = a.copy(opts = a.opts.copy(jaccardVerify = true)); i += 1
        case "--hot-band-prefilter" =>
          a = a.copy(opts = a.opts.copy(hotBandPrefilter = true)); i += 1
        case "--max-band-group" =>
          a = a.copy(opts = a.opts.copy(maxBandGroupSize = argv(i + 1).toInt)); i += 2
        case other =>
          throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    require(a.input != null && a.output != null,
      "usage: DedupJob --input <parquet> --output <dir> [--checkpoint <dir>] " +
        "[--text-only] [--jaccard-verify] [--hot-band-prefilter] [--max-band-group N]")
    a
  }

  def run(spark: SparkSession, a: Args,
      cfg: GraftConfig = GraftConfig.default): (Long, Long) = {
    val ledger = a.checkpoint.map(dir => new Ledger(spark, dir, cfg.configHash))
    val pipe = new DedupPipeline(spark, cfg, a.opts, ledger)
    val input = spark.read.parquet(a.input)
    val out = pipe.run(input, fromHtml = a.fromHtml)
    out.write.mode("overwrite").parquet(a.output)
    val written = spark.read.parquet(a.output)
    (written.count(), written.select("cluster_id").distinct().count())
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder().appName("graft-dedup").getOrCreate()
    try {
      val (docs, clusters) = run(spark, a)
      println(s"DEDUP_DONE docs=$docs clusters=$clusters output=${a.output}")
    } finally spark.stop()
  }
}
