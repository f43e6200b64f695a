package graft.probe

import graft.multimodal.Media

/** Raw codec cost per image (no Spark): encode / decode / resize walls for
  * the generation-rule images, single-threaded and multi-threaded.
  */
object MediaCodecProbe {
  def main(args: Array[String]): Unit = {
    val n = 5000
    def bench(label: String)(f: Long => Unit): Unit = {
      val t0 = System.nanoTime()
      (0L until n).foreach(f)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (${(System.nanoTime() - t0) / 1e3 / n}%6.0f us/img)")
    }
    // warmup
    (0L until 500L).foreach { i => Media.decode(i, "image", Media.encodeImage(i)) }
    bench("encode")(i => Media.encodeImage(i))
    val payloads = (0L until n).map(Media.encodeImage).toArray
    bench("decode")(i => Media.decode(i, "image", payloads(i.toInt)))
    bench("resize(24)+redecode")(i =>
      Media.decode(i, "image", Media.resizePayload(payloads(i.toInt), 24)))
    // multithreaded scaling of the full meta path
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val t0 = System.nanoTime()
    val fs = (0 until 4).map { t =>
      pool.submit(new Runnable {
        def run(): Unit =
          (t until n by 4).foreach(i => Media.decode(i, "image", Media.encodeImage(i)))
      })
    }
    fs.foreach(_.get())
    pool.shutdown()
    println(f"encode+decode x4 threads     ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }
}
