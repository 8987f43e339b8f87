package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.job.{ExtractJob, Transcripts}
import graft.query.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship end-to-end slice (SURVEY.md §7.2): synthesize transcripts →
    * extraction (typed mapPartitions) → stable ordering → chunk explode →
    * substring relevance search + min_score + top-k + broadcast page-meta
    * join. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = Transcripts.generate(spark, nConvs = 120)
    val extracted = ExtractJob.withTurnPos(ExtractJob.extract(turns)).toDF()
    val chunks = extracted
      .select(col("conv_id"), col("turn_idx"), col("turn_pos"), col("url"),
        explode(col("chunks")).as("c"))
      .select(col("conv_id"), col("turn_idx"), col("turn_pos"), col("url"),
        col("c.id").as("chunk_id"), col("c.chunk_type"), col("c.text"))
    val pagesMeta = extracted.select(col("url"), col("title"), col("summary"))
    val q = "ingredients"
    chunks
      .withColumn("relevance", graft.ops.TextOps.occurrences(lower(col("text")), q))
      .filter(col("relevance") >= 1)
      .orderBy(desc("relevance"), asc("url"), asc("chunk_id"))
      .limit(50)
      .join(broadcast(pagesMeta), "url")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (extraction, xxhash64-based sketches) → rows-only driver check;
    * those are gated by the golden-fixture ScalaTest suite instead. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (name, Queries.Q(_, Some(sql))) => name -> sql }.toMap
}
