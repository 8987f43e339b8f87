package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Dev-only (r07): stage-by-stage decomposition of the dedup family so the
  * optimization targets the stage that actually costs, not a guess. */
object R07Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r07-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"R07PROBE $label%-34s min=${ts.map(_._1).min}%.3f s  all=${ts.map(t => f"${t._1}%.3f").mkString(",")}  rows=${ts.head._2}")
    }

    time("noop") { docs.select("doc_id").write.format("noop").mode("overwrite").save(); 0L }
    time("shingles") {
      TextOps.shingles(docs, 3, None, Some(5)).write.format("noop").mode("overwrite").save(); 0L
    }
    time("minhash_sigs") {
      Dedup.minHashSignatures(docs, 3, 16, None, portable = false, Some(5))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("minhash_pairs") {
      Dedup.minHashPairs(docs, 3, 16, 4, 250, portable = false, maxDfPct = Some(5)).count()
    }
    val pairs = Dedup.minHashPairs(docs, 3, 16, 4, 250, portable = false, maxDfPct = Some(5))
      .localCheckpoint(true)
    println(s"pairs rows=${pairs.count()}")
    time("cc_star_on_pairs") { Dedup.connectedComponents(pairs).count() }
    time("neardup_clusters") {
      Dedup.neardupClusters(docs, 3, 16, 4, 250, portable = false, maxDfPct = Some(5)).count()
    }
    time("ngram_jaccard") {
      TextOps.ngramJaccardPairs(docs, 3, 200, None, Some(5)).count()
    }
    spark.stop()
  }
}
