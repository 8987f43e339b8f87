package graft.query

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{ExtractedTurn, Turn}

/** The reference's black-box protocol validator, re-expressed as a
  * distributed per-turn validation report over extraction output —
  * `/root/reference/validator/checks.py`:
  *
  *  - chunk fields present: id/text/type non-empty (:318-343)
  *  - no empty chunk text (:327-343, FAIL condition)
  *  - meta.total_chunks present (:346-353) → `n_chunks == size(chunks)`
  *  - noise check (:401-439): first-5 chunk text[:80] appears in the raw
  *    payload → "content appears real" (done as a join back to the input
  *    turn — at scale both sides are bucketed by conv_id, so the join is
  *    co-located)
  *
  * Pure column expressions — codegen'd, one join, no UDFs.
  */
object Validator {

  def report(extracted: Dataset[ExtractedTurn], turns: Dataset[Turn]): DataFrame = {
    val e = extracted.toDF()
    val chunkFieldsOk = !exists(col("chunks"),
      c => c.getField("id").isNull || length(c.getField("id")) === 0 ||
        c.getField("text").isNull ||
        c.getField("chunk_type").isNull || length(c.getField("chunk_type")) === 0)
    val emptyChunks = size(filter(col("chunks"),
      c => length(trim(c.getField("text"))) === 0))
    val totalChunksOk = col("n_chunks") === size(col("chunks"))

    val raw = turns.toDF().select(col("conv_id"), col("turn_idx"),
      col("text").as("raw_html"))
    // noise check: of the first 5 chunks with len(text)>20, how many have
    // their first 80 chars verbatim in the raw payload
    val firstFive = slice(col("chunks"), 1, 5)
    val matched = size(filter(firstFive, c =>
      length(trim(c.getField("text"))) > 20 &&
        col("raw_html").contains(substring(trim(c.getField("text")), 1, 80))))

    e.join(raw, Seq("conv_id", "turn_idx"))
      .select(
        col("conv_id"), col("turn_idx"),
        col("n_chunks"),
        chunkFieldsOk.as("chunk_fields_ok"),
        (emptyChunks === 0).as("no_empty_chunks"),
        totalChunksOk.as("total_chunks_ok"),
        matched.as("noise_matched"),
        least(size(col("chunks")), lit(5)).as("noise_checked"))
      .withColumn("noise_ok",
        col("n_chunks") === 0 || col("noise_matched") > 0)
  }

  /** Aggregate PASS/FAIL summary in the validator's spirit. */
  def summary(reportDf: DataFrame): DataFrame =
    reportDf.agg(
      count(lit(1)).as("pages"),
      sum(when(col("chunk_fields_ok"), 0).otherwise(1)).as("chunk_field_failures"),
      sum(when(col("no_empty_chunks"), 0).otherwise(1)).as("empty_chunk_failures"),
      sum(when(col("total_chunks_ok"), 0).otherwise(1)).as("total_chunks_failures"),
      sum(when(col("noise_ok"), 0).otherwise(1)).as("noise_warnings"))
}
