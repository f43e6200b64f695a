package graft.probe

import graft.multimodal.Media

/** Single-thread per-row cost split of the audio fixture: encode vs decode
  * vs window features. */
object AudioProbeMain {
  def main(args: Array[String]): Unit = {
    val n = 5000
    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name%-22s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    var payloads: Array[Array[Byte]] = null
    time("encodeAudio x5000") {
      payloads = (0 until n).map(id => Media.encodeAudio(id.toLong)).toArray
    }
    time("decodeAudio x5000") {
      var i = 0
      while (i < n) { Media.decodeAudio(i.toLong, "audio", payloads(i)); i += 1 }
    }
    time("encode+decode x5000, 32 threads") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val futs = (0 until 32).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t
            while (i < n) {
              Media.decodeAudio(i.toLong, "audio", Media.encodeAudio(i.toLong))
              i += 32
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
    }
  }
}
