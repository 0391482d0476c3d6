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
  * land in per-batch dirs under `<checkpoint>/inc_sigs` / `inc_bands`,
  * re-elected reps' stale postings are tombstoned under `inc_replaced`
  * (keeping the stored band table rep-only), all made visible atomically
  * by a commit marker written last (see `runIncremental`'s crash-
  * consistency note), and re-sent urls are dropped by the M7 anti-join
  * sweep. Repeated batches therefore keep matching the full-batch answer
  * on the growing union (asserted by test).
  */
object DedupJob {

  /** Rolling-state layout version — bump when signature/band semantics
    * change such that OLD delta rows can no longer interoperate with new
    * probe keys (v2: 64-bit band hashes + xxhash64 packed keys). */
  val IncStateVersion = 2

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
    * signed). See the object doc.
    *
    * CRASH CONSISTENCY: the three state deltas (band postings, rep
    * tombstones, signatures) land in per-batch subdirectories
    * (`inc_<table>/batch=<id>`) and become visible only when the batch's commit
    * marker (`inc_commits/<id>`) is written LAST — readers union only
    * COMMITTED batch dirs, so a crash between delta writes leaves orphan
    * directories that the next run ignores and overwrites. The batch id is
    * derived from the batch parquet's path + file listing, so a retry of
    * the same batch lands in the same dirs (idempotent), an
    * already-committed batch skips its state writes entirely (its urls are
    * swept by the M7 anti-join anyway), and the same path with NEW content
    * gets a fresh id.
    */
  def runIncremental(spark: SparkSession, a: Args,
      cfg: GraftConfig = GraftConfig.default): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val chk = a.checkpoint.get
    val ledger = new Ledger(spark, chk, cfg.configHash)
    val pipe = new DedupPipeline(spark, cfg, a.opts)
    val (baseSigs, baseBands) = graft.ops.MaintenanceOps.buildOrLoadDedupIndex(
      spark, spark.read.parquet(a.input), ledger, corpusTag = a.input, cfg, a.opts,
      fromHtml = a.fromHtml)

    val hadoopConf = spark.sparkContext.hadoopConfiguration
    def fsOf(p: String) = new org.apache.hadoop.fs.Path(p).getFileSystem(hadoopConf)
    val fs = fsOf(chk)

    // deterministic batch identity: path + sorted (name, length) listing —
    // stable across retries of the same files, different for new content
    val batchId = {
      val bp = new org.apache.hadoop.fs.Path(a.incremental.get)
      val listing = fsOf(a.incremental.get).listStatus(bp)
        .map(st => s"${st.getPath.getName}:${st.getLen}").sorted.mkString(",")
      java.lang.Long.toHexString(
        graft.hash.SimHash.hash64(s"batch:${a.incremental.get}:$listing"))
    }
    // versioned state layout: a band-semantics change (64-bit keys, v2)
    // makes pre-upgrade delta rows unmatchable by new probe keys, so the
    // rolling state is namespaced by version — old dirs become invisible
    // orphans instead of silently poisoning the union (their batches
    // re-ingest correctly if re-sent)
    val sv = s"v${DedupJob.IncStateVersion}"
    val commitsPath = new org.apache.hadoop.fs.Path(s"$chk/inc_commits/$sv")
    val committed: Seq[String] =
      if (!fs.exists(commitsPath)) Seq.empty
      else fs.listStatus(commitsPath).map(_.getPath.getName).toSeq.sorted

    val sigCols = Seq("doc_id", "url", "n_tokens", "hashable", "exact_hash",
      "exact_hash2", "has_exact", "sig", "simhash").map(col)
    val bandCols = Seq("doc_id", "band_id", "band_hash").map(col)
    // state read = union of COMMITTED per-batch delta dirs only (orphans
    // from a crashed run are invisible)
    def readCommitted(sub: String, like: org.apache.spark.sql.DataFrame) = {
      val dirs = committed.map(id => s"$chk/$sub/$sv/batch=$id").filter(d =>
        fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (dirs.isEmpty) like.limit(0) else spark.read.parquet(dirs: _*)
    }
    val oldSigs = baseSigs.select(sigCols: _*)
      .unionByName(readCommitted("inc_sigs", baseSigs).select(sigCols: _*))
    val replaced = readCommitted("inc_replaced", baseSigs.select("doc_id"))
    val oldBands = baseBands.select(bandCols: _*)
      .unionByName(readCommitted("inc_bands", baseBands.select(bandCols: _*)))
      .join(replaced.select("doc_id"), Seq("doc_id"), "left_anti")

    // M7 sweep: re-sent urls are already indexed — only genuinely new rows sign
    val batch = pipe.extractStage(spark.read.parquet(a.incremental.get), a.fromHtml)
    val fresh = graft.ops.MaintenanceOps.newDocs(batch, oldSigs)
    val newSigs = pipe.signatureStage(fresh).toDF().cache()
    // materialize the cache up front; a cache-partition loss later recomputes
    // against the same COMMITTED state (this batch's deltas are not yet
    // visible), so recomputation is identical
    val freshCount = newSigs.count()
    // ONE probe plan serves both the pair output and the state deltas
    val parts = pipe.probeParts(oldSigs, newSigs, Some(oldBands))
    val pairs = pipe.probeDupPairsFrom(parts, oldSigs, newSigs)
    pairs.write.mode("overwrite").parquet(a.output)
    val pairCount = spark.read.parquet(a.output).count()
    if (!committed.contains(batchId)) {
      parts.newBands.select(bandCols: _*)
        .write.mode("overwrite").parquet(s"$chk/inc_bands/$sv/batch=$batchId")
      parts.replacedReps.select("doc_id")
        .write.mode("overwrite").parquet(s"$chk/inc_replaced/$sv/batch=$batchId")
      newSigs.select(sigCols: _*)
        .write.mode("overwrite").parquet(s"$chk/inc_sigs/$sv/batch=$batchId")
      // commit LAST: the deltas become visible atomically with this marker
      fs.mkdirs(commitsPath)
      fs.create(new org.apache.hadoop.fs.Path(commitsPath, batchId), true).close()
    }
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
