package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only (r07 optimization round): time a subset of the query surface
  * EXACTLY the way graft.Bench does — same session config, production
  * overrides for the sketch twins, 3 reps, min reported + hot-rep spread —
  * so dev-loop numbers are comparable to BENCH_r{N}.json without paying
  * for the full scaling sweep. */
object R07Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_R07_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r07-time")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var total = 0.0
    names.foreach { name =>
      val fn = graft.query.Queries.benchProductionOverrides
        .getOrElse(name, graft.SparkEntry.queries(name))
      spark.sparkContext.setJobDescription(s"r07: $name")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val hot = times.drop(1)
      val spread = if (hot.size > 1) (hot.max - hot.min) / hot.min * 100.0 else 0.0
      total += times.min
      println(f"R07TIME $name%-28s min=${times.min}%.3f s  hotspread=$spread%.1f%%  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    println(f"R07TIME TOTAL ${total}%.3f s over ${names.size} queries")
    spark.stop()
  }
}
