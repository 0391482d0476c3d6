package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen

/** Materialize the deterministic synthetic bench corpus at one or more
  * scale factors (diagnostic tool — `Bench` generates these itself; this
  * exists so StageProfile/DedupRunOne can be run standalone without first
  * running the full bench).
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.map(_.toDouble).toSeq else Seq(0.02, 0.05, 2.5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try sfs.foreach { sf =>
      val path = s"/tmp/graft-bench-corpus-sf$sf"
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        CorpusGen.writeCorpus(spark, sf, path, seed = 42L)
        println(f"wrote $path in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } else println(s"exists: $path")
    } finally spark.stop()
  }
}
