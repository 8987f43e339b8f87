package graft.tools

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's flagship smoke: entry(spark) must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(s)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.select("url", "chunk_type", "relevance", "title").show(3, 48)
    s.stop()
  }
}
