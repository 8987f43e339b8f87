package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only (r07 optimization round): dump `explain("formatted")` for the
  * named queries to `plans/r07/<query>_<suffix>.txt`, using the SAME
  * session shape as graft.Bench (local[32], 32 shuffle partitions, AQE on,
  * 4 MB scan splits) so the committed plans match what the bench times.
  *
  * Usage: `sbt "runMain graft.tools.R07Plans before q1 q2 ..."`.
  *
  * Iterative queries (BFS / connected components) execute their driver
  * loop at plan-construction time and their final plan is a scan of the
  * last checkpoint; for those this tool additionally dumps the
  * representative per-level/per-round expansion plans published by the
  * operator modules.
  */
object R07Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r07-plans")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r07"))

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    names.foreach { name =>
      val out = name match {
        // iterative operators: the public query plan is a checkpoint scan;
        // dump the representative INNER shapes instead
        case "inner_minhash_pairs" =>
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val (frame, sigs) = graft.ops.Dedup.minHashPairsPlanned(
            docs, 3, 16, 4, 250, None, portable = false, maxDfPct = Some(5))
          val s = fmt(frame)
          sigs.unpersist()
          s
        case "inner_cc_round" =>
          import spark.implicits._
          val edges = Seq((5L, 1L), (4L, 1L), (3L, 2L)).toDF("big", "small")
            .localCheckpoint(true)
          fmt(graft.ops.Dedup.starRound(edges))
        case "inner_bfs_level" =>
          import org.apache.spark.sql.functions.{col, lit}
          import spark.implicits._
          val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
            .repartition(col("src")).localCheckpoint(true)
          val frontier = Seq(("a", 0)).toDF("url", "depth").localCheckpoint(true)
          fmt(edges.join(frontier.select(col("url").as("src")), "src")
            .select(col("dst").as("url")).distinct()
            .join(frontier.select("url"), Seq("url"), "left_anti")
            .select(col("url"), lit(1).as("depth")))
        case _ =>
          val fn = graft.query.Queries.benchProductionOverrides
            .getOrElse(name, graft.SparkEntry.queries(name))
          try fmt(fn(spark, sfDir)) catch { case e: Throwable => s"PLAN FAILED: $e" }
      }
      Files.writeString(Paths.get(s"plans/r07/${name}_$suffix.txt"), out)
      println(s"wrote plans/r07/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
