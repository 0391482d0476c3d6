package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.kernel.GraftConfig

/** Bulk export / import, ≅ S3/S4 (getExportData / addImportData,
  * /root/reference/mcrit/index/MinHashIndex.py:142-274): snapshot export
  * stamped with the config hash; import verifies config compatibility and
  * skips rows already present (the sha256-dedup analog keyed by url).
  *
  * The reference remaps integer ids via driver counters; at scale our ids
  * are content-derived (hash of url — no coordination), and `compactIds`
  * provides the sequential-id remap when a consumer needs dense ids, using
  * the per-partition-offset pattern (no global window, no single-partition
  * sort bottleneck).
  */
object ExportImport {

  private val MetaFile = "_graft_meta.json"

  def exportSnapshot(spark: SparkSession, df: DataFrame, path: String,
      cfg: GraftConfig = GraftConfig.default): Unit = {
    df.write.mode("overwrite").parquet(path)
    val rows = spark.read.parquet(path).count()
    val meta = s"""{"config_hash":"${cfg.configHash}","rows":$rows,"format":"parquet"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, MetaFile), meta)
  }

  final case class ImportResult(added: Long, skippedExisting: Long)

  /** Import `incomingPath` into `existing`, skipping urls already present;
    * refuses on config-hash mismatch (≅ MinHashIndex.py:209-213).
    * Returns (merged DataFrame, stats).
    */
  def importSnapshot(spark: SparkSession, existing: DataFrame, incomingPath: String,
      keyCol: String = "url",
      cfg: GraftConfig = GraftConfig.default): (DataFrame, ImportResult) = {
    val metaPath = java.nio.file.Paths.get(incomingPath, MetaFile)
    if (java.nio.file.Files.exists(metaPath)) {
      val meta = java.nio.file.Files.readString(metaPath)
      val hash = "\"config_hash\":\"([0-9a-f]+)\"".r
        .findFirstMatchIn(meta).map(_.group(1))
      require(hash.forall(_ == cfg.configHash),
        s"config hash mismatch: export=${hash.getOrElse("?")} local=${cfg.configHash}")
    }
    val incoming = spark.read.parquet(incomingPath)
    val newRows = incoming.join(existing.select(keyCol), Seq(keyCol), "left_anti")
    val added = newRows.count()
    val skipped = incoming.count() - added
    (existing.unionByName(newRows, allowMissingColumns = true),
      ImportResult(added, skipped))
  }

  /** Dense sequential ids without a global sort-window bottleneck: sort for
    * determinism, then per-partition counts → cumulative offsets (tiny
    * driver array) → mapPartitions offset+index. The classic zipWithIndex
    * shape, kept in Dataset land.
    */
  def compactIds(df: DataFrame, orderCol: String, idName: String = "compact_id"): DataFrame = {
    val spark = df.sparkSession
    // persist: range partitioning samples its boundaries, so the two passes
    // below must see one materialization, not two independent samplings
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+ StructField(idName, LongType, nullable = false))
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var k = bcOffsets.value(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    spark.createDataFrame(rows, schema)
  }
}
