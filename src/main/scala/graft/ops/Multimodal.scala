package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded / feature-extracted per batch
  * inside typed `mapPartitions` (the Scala analog of `mapInPandas`: one
  * decoder instance per partition, batch-shaped access).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * partitioning, batch shape, null handling) is real and tested, and a
  * libjpeg/ffmpeg-backed decoder drops in by replacing one function.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, sample_rate: Int, n_frames: Int,
      feature: Array[Float])

  /** Deterministic synthetic payloads (stand-in for a real binary column):
    * length and bytes derive from doc_id only. */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val n = 100 + (id % 400).toInt
      val bytes = Array.tabulate[Byte](n)(i => ((id * 31 + i * 7) & 0xFF).toByte)
      MediaRow(id, kind, bytes)
    }
  }

  /** STUB decoder — deterministic fake in place of libjpeg/libav (absent in
    * this container). Real implementation: parse header bytes per `kind`. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    val w = if (r.kind == "image") 16 * (1 + (r.doc_id % 40).toInt) else 0
    val h = if (r.kind == "image") 9 * (1 + (r.doc_id % 40).toInt) else 0
    val sr = if (r.kind == "audio") 16000 else 0
    val frames = if (r.kind == "video") 24 * (1 + (r.doc_id % 10).toInt) else 0
    // "feature extraction": 8-dim byte-histogram-ish vector from payload
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat((r.payload(i) & 0xFF) % 8) += 1.0f; i += 1 }
    MediaMeta(r.doc_id, r.kind, n, w, h, sr, frames, feat)
  }

  /** Decode/feature-extract pass: typed mapPartitions so a real decoder
    * would be constructed once per partition and fed batches. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder construction site (stubbed)
      it.map(decodeStub)
    }
  }

  /** Frame-sampling analog: explode video rows into every-nth-frame index
    * rows (plumbing for per-frame feature jobs). */
  def sampleFrames(meta: Dataset[MediaMeta], everyNth: Int = 24): DataFrame = {
    meta.toDF()
      .filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), explode(sequence(lit(0), col("n_frames") - 1,
        lit(everyNth))).as("frame_idx"))
  }
}
