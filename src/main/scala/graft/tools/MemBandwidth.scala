package graft.tools

/** Aggregate memory-bandwidth probe (STREAM-triad-like): each thread streams
  * a private 64 MB double array (far beyond LLC) computing a(i) = b(i) +
  * s·c(i). Prints aggregate GB/s at 1/4/8/16/32 threads. Evidence tool for
  * the N→4N scaling criterion: on a real cluster 4N executors bring 4× the
  * memory channels; on this single host the threads share one bus, and this
  * measures exactly where that bus saturates — the ceiling any
  * shuffle/exchange-bound stage inherits at wide parallelism.
  *
  * Run pinned, like the bench levels: `taskset -c 0-(N-1)`. `triadGbs` is
  * also callable in-process (Bench's fork-failure fallback and its
  * contention pre-probe use it directly).
  */
object MemBandwidth {

  /** One aggregate-triad measurement at `threads` threads, GB/s. Returns
    * 0.0 (never hangs) if a worker dies — e.g. OutOfMemoryError allocating
    * its ~3×`mbPerThread` arrays when run IN-PROCESS inside the bench JVM:
    * a dead worker would otherwise leave both the start barrier and the
    * completion latch waiting forever. Workers count down in a finally;
    * the start barrier and the latch are both time-bounded.
    */
  def triadGbs(threads: Int, mbPerThread: Int = 64): Double = {
    import java.util.concurrent.TimeUnit
    val n = mbPerThread * 1024 * 1024 / 8 / 3 // three arrays per thread
    val reps = 8
    val barrier = new java.util.concurrent.CyclicBarrier(threads + 1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val sink = new java.util.concurrent.atomic.DoubleAdder
    for (_ <- 0 until threads) {
      val th = new Thread(() => {
        try {
          val a = new Array[Double](n)
          val b = Array.tabulate(n)(i => i * 0.5)
          val c = Array.tabulate(n)(i => i * 0.25)
          barrier.await(120, TimeUnit.SECONDS)
          var r = 0
          while (r < reps) {
            var i = 0
            while (i < n) { a(i) = b(i) + 1.5 * c(i); i += 1 }
            r += 1
          }
          sink.add(a(n - 1))
        } catch {
          case _: Throwable => // broken barrier / OOM: recorded via the latch
        } finally done.countDown()
      })
      th.setDaemon(true)
      th.start()
    }
    try barrier.await(120, TimeUnit.SECONDS)
    catch { case _: Throwable => return 0.0 } // a worker died pre-start
    val t0 = System.nanoTime()
    if (!done.await(600, TimeUnit.SECONDS)) return 0.0
    val secs = (System.nanoTime() - t0) / 1e9
    // triad moves 3 arrays × 8 bytes × n × reps per thread (2 reads + 1 write)
    val bytes = 3.0 * 8 * n * reps * threads
    if (sink.sum() == Double.MinValue) println("impossible")
    bytes / secs / 1e9
  }

  /** Warmed best-of-2 at one thread count — the probe the bench embeds. */
  def probe(threads: Int, mbPerThread: Int = 64): Double = {
    triadGbs(2, mbPerThread) // warm JIT
    Seq.fill(2)(triadGbs(threads, mbPerThread)).max
  }

  def main(args: Array[String]): Unit = {
    val mbPerThread = if (args.nonEmpty) args(0).toInt else 64
    triadGbs(2, mbPerThread) // warm JIT
    // second arg: probe a single thread count (bench fork mode); default:
    // the full saturation ladder
    val levels = if (args.length > 1) Seq(args(1).toInt) else Seq(1, 4, 8, 16, 32)
    for (t <- levels) {
      val gbs = Seq.fill(2)(triadGbs(t, mbPerThread)).max
      println(f"MEMBW threads=$t%-2d aggregate=$gbs%7.2f GB/s")
    }
  }
}
