package graft.ledger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Checkpoint ledger: resumable stage execution keyed by descriptor, the
  * analog of the reference's job-descriptor result caching
  * (/root/reference/mcrit/queue/QueueRemoteCalls.py:134-152,
  * /root/reference/mcrit/queue/LocalQueue.py:497-519): a stage whose
  * descriptor (stage name + params hash + config hash + upstream descriptor
  * chain) already has a committed output is not recomputed.
  *
  * Locally the checkpoint store is parquet directories (the Iceberg stand-in;
  * the `_SUCCESS` marker plays the snapshot-commit role). Each materialized
  * stage also appends a metrics row (stage, descriptor, rows, wall ms,
  * per-partition row counts) to `<root>/_metrics` — the north_rule
  * "per-partition lineage and metrics" channel.
  */
final class Ledger(spark: SparkSession, root: String, configHash: String) {

  def descriptor(stage: String, params: String, upstream: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val s = s"$stage|$params|$configHash|${upstream.mkString(",")}"
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  private def path(stage: String, desc: String) = s"$root/$stage-$desc"

  /** Resolved through the Hadoop FileSystem API so the `_SUCCESS` probe
    * works wherever the parquet was written (HDFS/S3/local) — a
    * java.io.File probe would silently disable resume off-box.
    */
  private def fsExists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp)
  }

  def isDone(stage: String, desc: String): Boolean =
    fsExists(s"${path(stage, desc)}/_SUCCESS")

  /** Run-or-resume: if the descriptor's output is committed, read it back;
    * otherwise compute, persist, record metrics, and read back (so downstream
    * stages scan the materialized parquet, not the live lineage).
    */
  def stage(name: String, desc: String)(compute: => DataFrame): DataFrame = {
    val p = path(name, desc)
    if (isDone(name, desc)) {
      spark.read.parquet(p)
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(p)
      val wallMs = (System.nanoTime() - t0) / 1e6
      recordMetrics(name, desc, p, wallMs)
      spark.read.parquet(p)
    }
  }

  private def recordMetrics(name: String, desc: String, p: String, wallMs: Double): Unit = {
    try {
      val out = spark.read.parquet(p)
      // run_id ties each lineage set to its summary row: the same descriptor
      // can legitimately be recomputed (stage dir deleted, re-run) and both
      // tables are append-only
      val runId = java.util.UUID.randomUUID().toString
      // TRUE per-partition lineage (north_rule): one row per output partition
      // with its row count — cached so the summary below reuses the same scan
      val perPartition = out
        .withColumn("part_id", spark_partition_id())
        .groupBy("part_id").agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(name))
        .withColumn("descriptor", lit(desc))
        .withColumn("config_hash", lit(configHash))
        .withColumn("run_id", lit(runId))
        .withColumn("ts", current_timestamp())
        .cache()
      perPartition.write.mode("append").parquet(s"$root/_lineage")
      val summary = perPartition
        .agg(
          sum("rows").as("rows"),
          count(lit(1)).as("num_partitions"),
          max("rows").as("max_partition_rows"),
          min("rows").as("min_partition_rows"))
        .withColumn("stage", lit(name))
        .withColumn("descriptor", lit(desc))
        .withColumn("config_hash", lit(configHash))
        .withColumn("run_id", lit(runId))
        .withColumn("wall_ms", lit(wallMs))
        .withColumn("ts", current_timestamp())
      summary.write.mode("append").parquet(s"$root/_metrics")
      perPartition.unpersist()
    } catch { case scala.util.control.NonFatal(_) => () } // metrics are best-effort; fatal errors propagate
  }

  def metrics(): Option[DataFrame] =
    if (fsExists(s"$root/_metrics")) Some(spark.read.parquet(s"$root/_metrics")) else None

  /** Per-partition lineage rows: (part_id, rows, stage, descriptor,
    * config_hash, ts) — one row per output partition of every materialized
    * stage (the per-partition channel the aggregated `metrics()` summarizes).
    */
  def partitionMetrics(): Option[DataFrame] =
    if (fsExists(s"$root/_lineage")) Some(spark.read.parquet(s"$root/_lineage")) else None
}
