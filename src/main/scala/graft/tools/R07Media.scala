package graft.tools

import graft.ops.Multimodal

/** Dev-only (r07): synth-vs-decode cost split for the multimodal
  * operator, single-threaded — documents which side the wall time lives
  * on before deciding what to optimize. */
object R07Media {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val ids = 0L until n
    def synth(id: Long): Multimodal.MediaRow = (id % 3) match {
      case 0 => Multimodal.MediaRow(id, "image", Multimodal.synthImage(id))
      case 1 => Multimodal.MediaRow(id, "audio", Multimodal.synthAudio(id))
      case _ => Multimodal.MediaRow(id, "video",
        if (id % 6 == 5) Multimodal.synthVideoAvi(id) else Multimodal.synthVideo(id))
    }
    val rows = ids.map(synth)
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"R07MEDIA $label%-22s min=${ts.min}%.3f s")
    }
    time("synthesize")(ids.foreach(synth))
    time("decode")(rows.foreach(Multimodal.decodeOne))
  }
}
