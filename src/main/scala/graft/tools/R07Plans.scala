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
      val fn = graft.query.Queries.benchProductionOverrides
        .getOrElse(name, graft.SparkEntry.queries(name))
      val out = try fmt(fn(spark, sfDir)) catch {
        case e: Throwable => s"PLAN FAILED: $e"
      }
      Files.writeString(Paths.get(s"plans/r07/${name}_$suffix.txt"), out)
      println(s"wrote plans/r07/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
