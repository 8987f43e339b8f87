package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual SparkEntry queries at local[32]. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"QTIME $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
