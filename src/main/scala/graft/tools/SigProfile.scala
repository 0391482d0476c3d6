package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{DedupPipeline, DocSig}
object SigProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val path = "/tmp/graft-bench-corpus-sf2.5"
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SUB $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    val corpus = spark.read.parquet(path)
    println("files: " + corpus.rdd.getNumPartitions)
    timed("read html only")(corpus.select(sum(length(col("html")))).collect())
    timed("read+extract udf") {
      val ex = udf((h: Array[Byte]) => graft.kernel.TextNorm.extract(h))
      corpus.select(sum(length(ex(col("html"))))).collect()
    }
    timed("read text col only")(corpus.select(sum(length(col("text")))).collect())
    val pipe = new DedupPipeline(spark)
    timed("text->kernel (no html)") {
      pipe.signatureStage(corpus.select("url", "text")).toDF().select(count(lit(1))).collect()
    }
    timed("html->extract->kernel") {
      pipe.signatureStage(pipe.extractStage(corpus, fromHtml = true)).toDF().select(count(lit(1))).collect()
    }
    timed("kernel again (jit warm)") {
      pipe.signatureStage(pipe.extractStage(corpus, fromHtml = true)).toDF().select(count(lit(1))).collect()
    }
    spark.stop()
  }
}
