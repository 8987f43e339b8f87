package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Dev-only (r07): measure the shingle map side — interpreted
  * higher-order `transform` n-gram builder vs a single-pass closure —
  * and prove output equality on the full bench corpus before any swap.
  * (Both candidates are non-codegen; the question is how many
  * interpreted expression dispatches each shingle pays.) */
object R07Shingle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r07-shingle")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = 3

    val ngramUdf = udf { (ws: Seq[String]) =>
      if (ws == null) null
      else if (ws.length < n) Seq.empty[String]
      else {
        val out = new Array[String](ws.length - n + 1)
        var i = 0
        while (i < out.length) {
          val sb = new StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            val w = ws(i + j)
            if (w != null) sb.append(w)
            j += 1
          }
          out(i) = sb.toString
          i += 1
        }
        out.toSeq
      }
    }

    // the pre-r07 higher-order-transform builder, inlined (TextOps now
    // ships the closure, so the legacy form must live here to stay
    // measurable side-by-side)
    def legacyNgrams(words: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val idx = sequence(lit(0), size(words) - n)
      when(size(words) >= n,
        transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    def exprPath = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("_ws"))
      .select(col("doc_id"), explode(legacyNgrams(col("_ws"))).as("shingle"))
      .select(col("doc_id"), substring(md5(col("shingle")), 1, 16).as("sh"))
    def udfPath = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("_ws"))
      .select(col("doc_id"), explode(ngramUdf(col("_ws"))).as("shingle"))
      .select(col("doc_id"), substring(md5(col("shingle")), 1, 16).as("sh"))

    def time(label: String, reps: Int = 4)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R07SHINGLE $label%-18s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("expr_map_noop") { exprPath.write.format("noop").mode("overwrite").save() }
    time("udf_map_noop") { udfPath.write.format("noop").mode("overwrite").save() }

    // exact multiset equality of the shingle stream (order-free): any
    // difference in shingle content or multiplicity shifts these counts
    val a = exprPath.groupBy("doc_id", "sh").count()
    val b = udfPath.groupBy("doc_id", "sh").count()
    val onlyA = a.except(b).count()
    val onlyB = b.except(a).count()
    val rowsA = exprPath.count(); val rowsB = udfPath.count()
    println(s"R07SHINGLE equality rows=$rowsA/$rowsB exceptAB=$onlyA exceptBA=$onlyB " +
      (if (rowsA == rowsB && onlyA == 0 && onlyB == 0) "IDENTICAL" else "DIFFER"))
    spark.stop()
  }
}
