package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{DedupPipeline, PipelineOptions}
import graft.cluster.ConnectedComponents

/** Per-stage wall-clock attribution for the dedup pipeline on a corpus
  * parquet (diagnostic tool).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft-bench-corpus-sf2.5"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalesces reduce partitions to ~64MB regardless of core count,
      // flattening 8-vs-32 scaling; size them smaller so reduce parallelism
      // follows the session's core count
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val corpus = spark.read.parquet(path)
    val pipe = new DedupPipeline(spark)
    // JIT/codegen warm-up: without it the first stages absorb compilation
    // and the per-stage attribution inverts (a 32-core unwarmed profile
    // measured SLOWER than 8-core — pure JIT noise)
    val warmPath = "/tmp/graft-bench-corpus-sf0.05"
    if (new java.io.File(s"$warmPath/_SUCCESS").exists())
      pipe.run(spark.read.parquet(warmPath), fromHtml = true)
        .select("cluster_id").distinct().count()
    val docs = pipe.extractStage(corpus, fromHtml = true)
    val sigs0 = timed("signatures") {
      val d = pipe.signatureStage(docs).toDF().cache()
      d.count(); d
    }
    val sigs = sigs0.where(col("hashable"))
    val (reps, exactEdges) = pipe.exactGroups(sigs)
    val ee = timed("exact_edges") { val e = exactEdges.cache(); e.count(); e }
    val repSigs = sigs.join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(sigs.where(!col("has_exact")))
    val bands = timed("bands") {
      val b = pipe.bandStage(repSigs).unionByName(pipe.simhashBandStage(repSigs)).cache()
      b.count(); b
    }
    val cands = timed("candidates") {
      val c = pipe.candidateStage(bands, 2).cache(); println("  pairs: " + c.count()); c
    }
    val verified = timed("verify") {
      val v = pipe.verifyStage(cands, sigs).cache(); println("  verified: " + v.count()); v
    }
    val edges = ee.select("src", "dst").unionByName(verified.select(col("a").as("src"), col("b").as("dst")))
    val comp = timed("cc") {
      val c = ConnectedComponents.run(edges).cache(); println("  comps: " + c.count()); c
    }
    timed("assign") {
      sigs0.select("url", "doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
        .count()
    }
    spark.stop()
  }
}
