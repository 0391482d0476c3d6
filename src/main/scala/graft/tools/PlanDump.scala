package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.DedupPipeline

/** Dump the executed plans of the pipeline's load-bearing stages
  * (diagnostic tool — the `.explain` iteration loop from the build notes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = DedupRunOne.mkSession(4, 4)
    import spark.implicits._
    val docs = (1 to 200).map(i => (s"u$i", (1 to 40).map(w => s"t$i-$w").mkString(" ")))
      .toDF("url", "text")
    val pipe = new DedupPipeline(spark)
    println("==== signatureStage (incl. S1 url-dedup) ====")
    pipe.signatureStage(docs).toDF().explain("formatted")
    if (args.contains("semdedup")) {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      println("==== semDedup ====")
      graft.ops.AnnOps.semDedup(emb, eps = 0.6).explain("formatted")
    }
    spark.stop()
  }
}
