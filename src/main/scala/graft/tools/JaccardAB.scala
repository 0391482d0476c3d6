package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Quiet-window A/B for the n-gram Jaccard candidate generators (verdict r3
  * "what's wrong" #2: three mutually inconsistent numbers across two rounds):
  * prefix-filtered (`ngramJaccardPairs`) vs plain postings self-join
  * (`ngramJaccardPairsPlain`) on the SAME documents table, both warmed, both
  * best-of-N, plus the df-skew statistic `ngramJaccardAuto` dispatches on
  * and an output-equality check. One line per measurement; run it pinned in
  * a quiet window (check with MemBandwidth first).
  *
  * Usage: runMain graft.tools.JaccardAB [sfDir] [reps]
  */
object JaccardAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = DedupRunOne.mkSession(32, 32)
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
      docs.count()

      // the dispatch statistic: E[df of a random posting] / mean df
      val stat = DedupOps.ngramJaccardAutoStat(spark, docs)
      println(f"JACCARD_AB stat e_df=${stat._1}%.2f mean_df=${stat._2}%.2f skew=${stat._1 / math.max(1.0, stat._2)}%.3f")

      def time(name: String, f: () => Long): Unit = {
        f() // warm (codegen, shuffle files, JIT)
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = times.map(_._1).min
        println(f"JACCARD_AB $name%-8s best=$best%6.2fs rows=${times.head._2} runs=${times.map(t => f"${t._1}%.2f").mkString(",")}")
      }
      time("prefix", () => DedupOps.ngramJaccardPairs(spark, docs).count())
      time("plain", () => DedupOps.ngramJaccardPairsPlain(spark, docs).count())

      // output equality on the full table (the oracle-level guarantee)
      val a = DedupOps.ngramJaccardPairs(spark, docs)
      val b = DedupOps.ngramJaccardPairsPlain(spark, docs)
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"JACCARD_AB equal=${diff == 0}")
    } finally spark.stop()
  }
}
