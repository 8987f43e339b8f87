package graft.tools

import graft.job.{ExtractJob, Transcripts}
import graft.model.Turn
import java.sql.Timestamp

/** Dev-only (r07): single-threaded micro-profile of the extraction hot
  * loop over the exact bench payload mix — which stage of extractOne
  * costs, per payload kind, without Spark in the way. */
object R07Extract {
  def main(args: Array[String]): Unit = {
    val perKind = args.headOption.map(_.toInt).getOrElse(2000)
    // payload mix mirroring Transcripts.generate's kind distribution
    val kinds = 0 until 10
    val turns: Seq[(Int, Turn)] = kinds.flatMap { k =>
      (0 until perKind).map { i =>
        val text = Transcripts.payload(k, i.toLong, i % 40)
        val tool = if (k % 10 == 4) "render" else "fetch"
        k -> Turn(s"conv$i", i % 40, "agent", text, tool,
          new Timestamp(Transcripts.EpochStart * 1000L + i * 1000L))
      }
    }
    // warmup
    turns.foreach { case (_, t) => ExtractJob.extractOne(t) }
    (1 to 3).foreach { rep =>
      val byKind = turns.groupBy(_._1)
      val res = kinds.map { k =>
        val ts = byKind(k).map(_._2)
        val t0 = System.nanoTime()
        var i = 0
        while (i < ts.length) { ExtractJob.extractOne(ts(i)); i += 1 }
        val dt = (System.nanoTime() - t0) / 1e9
        (k, dt, ts.length / dt, ts.map(_.text.length).sum / ts.length)
      }
      val total = res.map(_._2).sum
      println(f"rep $rep: total ${total}%.2f s -> ${turns.size / total}%.0f turns/s/core")
      res.foreach { case (k, dt, tps, avgLen) =>
        println(f"  kind $k%2d: ${dt}%.3f s  ${tps}%9.0f turns/s  avg ${avgLen}%5d chars  ${dt / total * 100}%5.1f%% of total")
      }
    }
  }
}
