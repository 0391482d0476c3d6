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
  *     [--incremental <parquet>]     ROLLING incremental batch (see below)
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
  *
  * INCREMENTAL MODE (`--incremental <batch parquet>`, requires
  * --checkpoint): the --input corpus is signed/banded AT MOST ONCE into
  * the ledger (`MaintenanceOps.buildOrLoadDedupIndex`; later runs never
  * touch --input), the batch is probe-matched against the stored index
  * (`DedupPipeline.probeDupPairs` — candidate work ∝ batch, never corpus),
  * the output is the merged-channel dup pairs touching the batch, and the
  * index state ROLLS FORWARD: new signatures and new reps' band postings
  * append under `<checkpoint>/inc_sigs` / `inc_bands`, re-elected reps'
  * stale postings are tombstoned under `inc_replaced` (keeping the stored
  * band table rep-only), and re-sent urls are dropped by the M7 anti-join
  * sweep. Repeated batches therefore keep matching the full-batch answer
  * on the growing union (asserted by test).
  */
object DedupJob {

  final case class Args(input: String = null, output: String = null,
      checkpoint: Option[String] = None, fromHtml: Boolean = true,
      incremental: Option[String] = None,
      opts: PipelineOptions = PipelineOptions())

  private[graft] def parse(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--output" => a = a.copy(output = argv(i + 1)); i += 2
        case "--checkpoint" => a = a.copy(checkpoint = Some(argv(i + 1))); i += 2
        case "--incremental" => a = a.copy(incremental = Some(argv(i + 1))); i += 2
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
        "[--incremental <parquet>] [--text-only] [--jaccard-verify] " +
        "[--hot-band-prefilter] [--max-band-group N]")
    require(a.incremental.isEmpty || a.checkpoint.nonEmpty,
      "--incremental requires --checkpoint (the persisted index lives there)")
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

  /** One rolling incremental step; returns (pair rows written, fresh docs
    * signed). See the object doc. */
  def runIncremental(spark: SparkSession, a: Args,
      cfg: GraftConfig = GraftConfig.default): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val chk = a.checkpoint.get
    val ledger = new Ledger(spark, chk, cfg.configHash)
    val pipe = new DedupPipeline(spark, cfg, a.opts)
    val (baseSigs, baseBands) = graft.ops.MaintenanceOps.buildOrLoadDedupIndex(
      spark, spark.read.parquet(a.input), ledger, corpusTag = a.input, cfg, a.opts,
      fromHtml = a.fromHtml)

    def readOpt(path: String, like: org.apache.spark.sql.DataFrame) = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) spark.read.parquet(path) else like.limit(0)
    }
    val sigCols = Seq("doc_id", "url", "n_tokens", "hashable", "exact_hash",
      "exact_hash2", "has_exact", "sig", "simhash").map(col)
    val bandCols = Seq("doc_id", "band_id", "band_hash").map(col)
    val oldSigs = baseSigs.select(sigCols: _*)
      .unionByName(readOpt(s"$chk/inc_sigs", baseSigs).select(sigCols: _*))
    val replaced = readOpt(s"$chk/inc_replaced", baseSigs.select("doc_id"))
    val oldBands = baseBands.select(bandCols: _*)
      .unionByName(readOpt(s"$chk/inc_bands", baseBands.select(bandCols: _*)))
      .join(replaced.select("doc_id"), Seq("doc_id"), "left_anti")

    // M7 sweep: re-sent urls are already indexed — only genuinely new rows sign
    val batch = pipe.extractStage(spark.read.parquet(a.incremental.get), a.fromHtml)
    val fresh = graft.ops.MaintenanceOps.newDocs(batch, oldSigs)
    val newSigs = pipe.signatureStage(fresh).toDF().cache()
    // materialize the cache BEFORE any state append: the lineage's anti-join
    // reads inc_sigs, and a post-append re-evaluation would see the batch's
    // own rows and collapse `fresh` to empty
    val freshCount = newSigs.count()
    val parts = pipe.probeParts(oldSigs, newSigs, Some(oldBands))
    val pairs = pipe.probeDupPairs(oldSigs, newSigs, Some(oldBands))
    pairs.write.mode("overwrite").parquet(a.output)
    val pairCount = spark.read.parquet(a.output).count()
    // roll the index state forward for the next batch. Order matters: the
    // band/tombstone deltas' lazy plans read the PRE-batch inc_sigs state,
    // so the new signatures append last.
    parts.newBands.select(bandCols: _*).write.mode("append").parquet(s"$chk/inc_bands")
    parts.replacedReps.select("doc_id").write.mode("append").parquet(s"$chk/inc_replaced")
    newSigs.select(sigCols: _*).write.mode("append").parquet(s"$chk/inc_sigs")
    newSigs.unpersist()
    (pairCount, freshCount)
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder().appName("graft-dedup").getOrCreate()
    try {
      a.incremental match {
        case Some(_) =>
          val (pairRows, freshDocs) = runIncremental(spark, a)
          println(s"DEDUP_INCREMENTAL_DONE pairs=$pairRows new_docs=$freshDocs output=${a.output}")
        case None =>
          val (docs, clusters) = run(spark, a)
          println(s"DEDUP_DONE docs=$docs clusters=$clusters output=${a.output}")
      }
    } finally spark.stop()
  }
}
