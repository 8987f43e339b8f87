package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry(spark) returns rows > 0 quickly. */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("entry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns scored, enveloped rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSet == Set("url", "conv_id", "turn_idx", "turn_pos",
      "chunk_id", "chunk_type", "text", "relevance", "title", "summary"))
    // relevance-ordered, all matches contain the query term
    assert(rows.forall(_.getAs[String]("text").toLowerCase.contains("ingredients")))
  }

  test("queries and oracleSql are consistent") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet))
    assert(qs.size >= 40)
    assert(os.size >= 33)
  }
}
