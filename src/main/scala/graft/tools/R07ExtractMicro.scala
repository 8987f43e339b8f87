package graft.tools

import graft.extract.{ChunkHtml, HtmlDom, MetaExtract, TextUtil}
import graft.job.Transcripts

/** Dev-only (r07): sub-stage timing inside the extraction hot path for
  * one payload kind. */
object R07ExtractMicro {
  def main(args: Array[String]): Unit = {
    val kind = args.headOption.map(_.toInt).getOrElse(6)
    val n = args.lift(1).map(_.toInt).getOrElse(3000)
    val payloads = (0 until n).map(i => Transcripts.payload(kind, i.toLong, i % 40))

    def time(label: String)(f: String => Any): Unit = {
      // warmup
      payloads.take(500).foreach(f)
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        payloads.foreach(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"R07MICRO kind=$kind $label%-28s min=${reps.min}%.3f s  (${n / reps.min}%9.0f /s)")
    }

    time("full ChunkHtml.extract")(h => ChunkHtml.extract("u", h, Some("t")))
    time("HtmlDom.parse")(h => HtmlDom.parse(h))
    time("parse+MetaIndex") { h =>
      val d = HtmlDom.parse(h); new MetaExtract.MetaIndex(d)
    }
    time("parse+MetaIndex+extractMeta") { h =>
      val d = HtmlDom.parse(h)
      val idx = new MetaExtract.MetaIndex(d)
      MetaExtract.extractMetadata(h, idx)
    }
    time("cleanText")(h => TextUtil.cleanText(h))
    time("splitSentences")(h => TextUtil.splitSentences(h))
  }
}
