package graft.probe

import graft.extract.{Mentions, OpenIE, Synth}

/** Single-thread micro-profile of the extraction hot path. */
object OpenIEProbeMain {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val pages = (0 until n).map(i => Synth.pageUrlText(i.toLong)).toArray
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$name%-26s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    time("OpenIE.extract") {
      var c = 0L; pages.foreach { case (u, t) => c += OpenIE.extract(u, t).size }; c
    }
    time("sentencesOf only") {
      var c = 0L; pages.foreach { case (_, t) => c += OpenIE.sentencesOf(t).size }; c
    }
    time("sentenceWords per sent") {
      var c = 0L
      pages.foreach { case (_, t) =>
        OpenIE.sentencesOf(t).foreach(s => c += Mentions.sentenceWords(s).size)
      }
      c
    }
    time("detect per sent") {
      var c = 0L
      pages.foreach { case (_, t) =>
        OpenIE.sentencesOf(t).foreach(s => c += Mentions.detect(s).size)
      }
      c
    }
  }
}
