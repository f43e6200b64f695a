package graft

import graft.extract.{OpenIE, Synth}
import java.util.concurrent.Executors

/** Diagnostic: raw JVM thread-scaling of the extraction hot path, no Spark.
  * Separates engine-level scaling problems from executor/GC/host effects.
  */
object ThreadScaleProbe {

  /** Wall time of the raw extraction hot path at `threads` over `pages`
    * synthesized pages — no Spark, so the ratio between two thread counts is
    * the HOST's parallel-speedup ceiling in this contention window.
    */
  def wall(threads: Int, pages: Int): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val chunk = pages / threads
    val t0 = System.nanoTime()
    val futures = (0 until threads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = t.toLong * chunk
          val end = i + chunk
          var acc = 0L
          while (i < end) {
            val spec = Synth.pageSpec(i)
            val text = Synth.textOf(spec)
            acc += OpenIE.extract(spec.url, text).size
            i += 1
          }
          if (acc == -1) println("impossible")
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    (System.nanoTime() - t0) / 1e9
  }

  /** Host scaling efficiency from `threadsN` to `threads4N` right now
    * (1.0 = ideal): the explicit denominator for the Spark-level scaling
    * ratio when the shared host itself cannot scale (VERDICT r3 #1).
    */
  def hostScaling(threadsN: Int, threads4N: Int, pages: Int = 60000): Double = {
    wall(threads4N, math.max(pages / 8, 1000)) // warmup (JIT)
    val w4 = wall(threads4N, pages)
    val wN = wall(threadsN, pages)
    (wN / w4) / (threads4N.toDouble / threadsN)
  }

  def main(args: Array[String]): Unit = {
    val pages = if (args.nonEmpty) args(0).toInt else 200000
    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = pages / threads
      val t0 = System.nanoTime()
      val futures = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t.toLong * chunk
            val end = i + chunk
            var acc = 0L
            while (i < end) {
              val spec = Synth.pageSpec(i)
              val text = Synth.textOf(spec)
              acc += OpenIE.extract(spec.url, text).size
              i += 1
            }
            if (acc == -1) println("impossible")
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    run(4); run(4)
    Seq(1, 4, 8, 16, 32).foreach { t =>
      val s = run(t)
      println(f"threads=$t%2d wall=$s%6.2f s rate=${pages / s}%.0f pages/s")
    }
  }
}
