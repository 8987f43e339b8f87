package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.job.{ExtractJob, Transcripts}

class ValidatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("validator-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extraction output passes the reference validator's content checks") {
    val turns = Transcripts.generate(spark, 80)
    val extracted = ExtractJob.extract(turns)
    val report = Validator.report(extracted, turns)
    val s = Validator.summary(report).collect().head
    assert(s.getLong(0) == Transcripts.expectedCount(80))
    assert(s.getLong(1) == 0, "chunk field failures")
    assert(s.getLong(2) == 0, "empty chunk failures")
    assert(s.getLong(3) == 0, "total_chunks failures")
    // noise check is a WARN-level signal: whitespace-collapsed chunk text
    // only matches raw HTML verbatim when the source wasn't re-wrapped;
    // the plain/markdown payloads in the pool satisfy it
    val noiseOkCount = report.filter(org.apache.spark.sql.functions.col("noise_ok"))
      .count()
    assert(noiseOkCount > s.getLong(0) / 2, s"noise_ok only $noiseOkCount")
  }
}
