package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.pipeline.DedupPipeline

/** Sub-step attribution for the candidate stage (diagnostic tool): times
  * the band explode, the provable-hot detection pass, the posting shuffle +
  * pair emission, and the ≥2-band pair count separately, plus an A/B of
  * pairsFromBands against a detection-free variant, on the bench corpus.
  */
object CandProfile {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft-bench-corpus-sf2.5"
    val spark = DedupRunOne.mkSession(32, 32)
    import spark.implicits._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"CAND $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val corpus = spark.read.parquet(path)
    val pipe = new DedupPipeline(spark)
    // warm on the standard warmup corpus (materialized via the bench's own
    // contract if absent), or on an explicit second argument
    val warmPath =
      if (args.length > 1) args(1) else graft.Bench.ensureCorpus(0.05)
    pipe.run(spark.read.parquet(warmPath), fromHtml = true)
      .select("cluster_id").distinct().count()
    val sigs = pipe.signatureStage(pipe.extractStage(corpus, fromHtml = true))
      .toDF().where(col("hashable")).cache()
    sigs.count()
    val (reps, _) = pipe.exactGroups(sigs)
    val repSigs = sigs.join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(sigs.where(!col("has_exact")))
    def bands(): DataFrame =
      pipe.bandStage(repSigs).unionByName(pipe.simhashBandStage(repSigs))
    // materialized band table so downstream steps don't pay the explode
    val bandsCached = timed("band explode (cache+count)") {
      val b = bands().cache(); println("  postings: " + b.count()); b
    }
    val keyed = bandsCached
      .select(graft.pipeline.DedupPipeline.packedBandKey(col("band_id"), col("band_hash")).as("band_key"),
        col("doc_id"))
      .as[(Long, Long)]
    timed("detection pass only") {
      println("  hot keys: " + DedupPipeline.provablyHotKeys(spark, keyed, 500).count())
    }
    timed("local-cap pass only") {
      val n = keyed.mapPartitions { it =>
        val counts = new DedupPipeline.LongCounter(1 << 16)
        it.filter { case (k, _) =>
          val c = counts.incrBounded(k, 4 << 20); c == -1 || c <= 501
        }
      }.rdd.count()
      println("  capped postings: " + n)
    }
    val rawPairs = timed("shuffle+pairgen (no filter)") {
      val p = keyed.groupByKey(_._1).flatMapGroups { (_: Long, rows: Iterator[(Long, Long)]) =>
        val ids = new scala.collection.mutable.ArrayBuffer[Long](64)
        var overflow = false
        while (rows.hasNext) {
          val id = rows.next()._2
          if (!overflow) { ids += id; if (ids.length > 500) overflow = true }
        }
        if (overflow || ids.length < 2) Iterator.empty
        else {
          val arr = ids.toArray
          java.util.Arrays.sort(arr)
          arr.indices.iterator.flatMap(i =>
            ((i + 1) until arr.length).iterator.map(j => (arr(i), arr(j))))
        }
      }.toDF("a", "b").cache()
      println("  raw pairs: " + p.count()); p
    }
    timed("pair count >=2") {
      println("  pairs: " + rawPairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).count())
    }
    rawPairs.unpersist()
    // A/B: shipped pairsFromBands (cache + detection + anti-join + cap)
    // vs the same from the already-materialized band table
    for (i <- 1 to 2)
      timed(s"pairsFromBands shipped #$i") {
        println("  pairs: " +
          DedupPipeline.pairsFromBands(spark, bands(), 500, 2).count())
      }
    for (i <- 1 to 2)
      timed(s"pairsFromBands on cached #$i") {
        println("  pairs: " +
          DedupPipeline.pairsFromBands(spark, bandsCached, 500, 2).count())
      }
    spark.stop()
  }
}
