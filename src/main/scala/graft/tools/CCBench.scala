package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: star-contraction vs min-label connected components on (a)
  * the real sf near-dup pair graph (shallow replica fans — min-label's
  * best case) and (b) a deep chain (its worst case), to back the
  * `connectedComponents` default with a measurement. Results land in
  * NOTES.md by hand. */
object CCBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"CCBENCH $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n labels)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.ops.Dedup.minHashPairs(docs, n = 3, k = 16, bands = 4,
      minEstJaccardX1000 = 250, portable = false, maxDfPct = Some(5))
      .persist()
    println(s"CCBENCH pair graph: ${pairs.count()} edges ($sfDir)")
    timed("fan-graph star")(
      graft.ops.Dedup.connectedComponentsStar(pairs).count())
    timed("fan-graph minlabel")(
      graft.ops.Dedup.connectedComponentsMinLabel(pairs).count())
    pairs.unpersist()

    val chain = spark.range(2000)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    timed("chain-2000 star")(
      graft.ops.Dedup.connectedComponentsStar(chain).count())
    // min-label on a depth-2000 chain needs 2001 rounds — skipped (that
    // asymmetry is the point; see OpsSpec's depth-200 round pin)
    spark.stop()
  }
}
