package graft.tools
import graft.kernel._
import graft.pipeline.DocSig
/** Pure-JVM thread-scaling probe of the per-doc kernel (no Spark). */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val perThread = 30000
    val rng = new java.util.Random(1)
    def letters(v0: Long): String = {
      var v = math.abs(v0); val sb = new StringBuilder
      do { sb += ('a' + (v % 26)).toChar; v /= 26 } while (v > 0)
      sb.toString
    }
    val texts = (0 until 200).map { c =>
      (0 until 3).map(_ => (0 until 80).map(_ => s"${letters(c)}q${letters(rng.nextInt(4000))}").mkString(" ")).mkString("\n\n")
    }.toArray
    // warmup
    val warm = new DocSig.Kernel(GraftConfig.default)
    for (i <- 0 until 8000) warm.compute(s"w$i", texts(i % texts.length))
    var base = 0.0
    for (n <- Seq(1, 8, 32)) {
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        new Thread(() => {
          val k = new DocSig.Kernel(GraftConfig.default)
          var i = 0
          while (i < perThread) { k.compute(s"u$t-$i", texts((t * 31 + i) % texts.length)); i += 1 }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      val tput = n.toLong * perThread / dt
      if (n == 1) base = tput
      println(f"THREADS $n%2d: $dt%6.2f s, ${tput / 1000}%6.1f kdocs/s, speedup ${tput / base}%5.2f")
    }
  }
}
