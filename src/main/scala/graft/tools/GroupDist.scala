package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.DedupPipeline

/** Band-group size distribution + identical-member-set repetition on the
  * bench corpus (diagnostic for the candidate-stage shuffle shape).
  */
object GroupDist {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft-bench-corpus-sf2.5"
    val spark = DedupRunOne.mkSession(32, 32)
    import spark.implicits._
    val pipe = new DedupPipeline(spark)
    val sigs = pipe.signatureStage(pipe.extractStage(spark.read.parquet(path), fromHtml = true))
      .toDF().where(col("hashable")).cache()
    val (reps, _) = pipe.exactGroups(sigs)
    val repSigs = sigs.join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(sigs.where(!col("has_exact")))
    val bands = pipe.bandStage(repSigs).unionByName(pipe.simhashBandStage(repSigs))
    val keyed = bands.select(
      graft.pipeline.DedupPipeline.packedBandKey(col("band_id"), col("band_hash")).as("band_key"),
      col("doc_id"))
    val groups = keyed.groupBy("band_key").agg(
      count(lit(1)).as("s"), xxhash64(sort_array(collect_list(col("doc_id")))).as("set_key"))
      .where(col("s").between(2, 500)).cache()
    println("multi-member groups: " + groups.count())
    groups.groupBy("s").agg(count(lit(1)).as("groups"),
        (count(lit(1)) * col("s") * (col("s") - 1) / 2).as("pairs"))
      .orderBy("s").show(30, false)
    val sets = groups.groupBy("set_key").agg(count(lit(1)).as("band_reps"), first("s").as("s"))
    println("distinct member sets: " + sets.count())
    sets.agg(sum(col("s") * (col("s") - 1) / 2).as("pairs_after_set_dedup"),
      sum(col("band_reps") * col("s") * (col("s") - 1) / 2).as("pairs_raw")).show(false)
    spark.stop()
  }
}
