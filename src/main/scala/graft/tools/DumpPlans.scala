package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.job.{ExtractJob, Transcripts}

/** Writes PLANS.md: `explain("formatted")` output of the flagship pipeline
  * and the headline queries — the "is this the plan you'd want at 100 TB"
  * artifact, regenerated with `sbt "runMain graft.tools.DumpPlans"`. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dump-plans")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    val sb = new StringBuilder
    sb ++= "# PLANS — physical plans of the flagship pipeline and headline queries\n\n"
    sb ++= "Regenerate: `sbt \"runMain graft.tools.DumpPlans\"`. Assertions on these\n"
    sb ++= "shapes live in `PlanSpec` (pushdown, pruning, broadcast, codegen,\n"
    sb ++= "shuffle counts, AQE skew split, bucketed co-location).\n"

    val turns = Transcripts.generate(spark, 50)
    val sections = Seq(
      "extraction (zero-shuffle typed mapPartitions)" ->
        fmt(ExtractJob.extract(turns).toDF()),
      "extraction + stable ordering window (one exchange)" ->
        fmt(ExtractJob.withTurnPos(ExtractJob.extract(turns)).toDF()),
      "q1_agg (partial aggregation, integer-cents sums)" ->
        fmt(SparkEntry.queries("q1_agg")(spark, sf)),
      "j1_broadcast_join (small dim broadcast)" ->
        fmt(SparkEntry.queries("j1_broadcast_join")(spark, sf)),
      "p12_product_filters (pushed filters + pruned columns)" ->
        fmt(SparkEntry.queries("p12_product_filters")(spark, sf)),
      "p10_topk_min_score (TakeOrderedAndProject)" ->
        fmt(SparkEntry.queries("p10_topk_min_score")(spark, sf)),
      "x_exact_dedup (map-side combine, hashes shuffle — not text)" ->
        fmt(SparkEntry.queries("x_exact_dedup")(spark, sf)),
      "x_embedding_topk (single scan, codegen'd dot products)" ->
        fmt(SparkEntry.queries("x_embedding_topk")(spark, sf)),
      "p3_pagination (sort+offset+limit → TakeOrderedAndProject, no global window)" ->
        fmt(SparkEntry.queries("p3_pagination")(spark, sf)),
      "w4_tombstone_fifo (top-k, no global window)" ->
        fmt(SparkEntry.queries("w4_tombstone_fifo")(spark, sf)),
      "x_search_end_to_end (hashed embed → score → top-k → broadcast meta join)" ->
        fmt(SparkEntry.queries("x_search_end_to_end")(spark, sf)),
      "scalableTurnPos (distributed prefix offsets, broadcast join back)" ->
        fmt(ExtractJob.scalableTurnPos(ExtractJob.extract(turns), 4).toDF()),
      "x_sync_envelope (one plan: window filter → partial collect aggs → 1-row broadcast join)" ->
        fmt(SparkEntry.queries("x_sync_envelope")(spark, sf)),
      "p15_product_envelope (variants agg + dim join, pushed partkey filters)" ->
        fmt(SparkEntry.queries("p15_product_envelope")(spark, sf)),
      "a8_analytics_rollup (event fan-out explode → map-side combined rollup)" ->
        fmt(SparkEntry.queries("a8_analytics_rollup")(spark, sf)),
      "a6_rate_window (streamed limiter walk: bucket hash exchange → partition-local spillable sort → mapPartitions; no per-bucket heap materialization)" ->
        fmt(SparkEntry.queries("a6_rate_window")(spark, sf)),
      "x_adapter_drupal (ONE hash exchange on node_id → typed flatMapGroups; groups are O(paras-per-node))" ->
        fmt(SparkEntry.queries("x_adapter_drupal")(spark, sf)),
      "x_search_joomla_sql (filter → TakeOrderedAndProject page + 1-row broadcast total; no window)" ->
        fmt(SparkEntry.queries("x_search_joomla_sql")(spark, sf)),
      "x_search_drupal_scored (two TopK branches → ≤20-row union; windows only on post-limit micro-sets)" ->
        fmt(SparkEntry.queries("x_search_drupal_scored")(spark, sf)),
      "crawl BFS — ONE level's expansion (the checkpointed full query hides this shape)" -> {
        // the per-level plan: links ⋈ frontier on src, anti-join visited —
        // dumping the full s1 query would execute the whole BFS and show
        // only a Scan ExistingRDD of the final checkpoint
        import spark.implicits._
        import org.apache.spark.sql.functions.{col, lit}
        val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
        val frontier = Seq(("a", 0)).toDF("url", "depth")
        fmt(edges.join(frontier.select(col("url").as("src")), "src")
          .select(col("dst").as("url")).distinct()
          .join(frontier.select("url"), Seq("url"), "left_anti")
          .select(col("url"), lit(1).as("depth")))
      },
    )
    sections.foreach { case (title, plan) =>
      sb ++= s"\n## $title\n\n```\n${plan.trim.take(4000)}\n```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
