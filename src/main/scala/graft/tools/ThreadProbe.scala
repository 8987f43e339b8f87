package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import graft.job.Transcripts

/** Dev-only: raw extraction scaling without Spark — isolates our code's
  * thread scaling from Spark machinery. */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val nTurns = 400000
    val turns = (0 until nTurns).map { i =>
      Transcripts.mkTurn(i / 8, i % 8, "conv-")
    }.toArray
    def run(threads: Int): Double = {
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < nTurns) {
            graft.extract.ChunkHtml.extract(s"u#$i", turns(i).text, Some("2026-01-01"))
            i = idx.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    run(8) // warmup
    val t8 = Seq(run(8), run(8)).min
    val t32 = Seq(run(32), run(32)).min
    println(f"pure extraction: t8=$t8%.2f t32=$t32%.2f scaling=${(32.0 / t32) / (8.0 / t8) * 8 / 32 * 4}%.2f eff=${(t8 / t32) / 4.0}%.2f")
  }
}
