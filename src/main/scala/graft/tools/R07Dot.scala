package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Dev-only (r07): measure the interpreted `aggregate(zip_with(...))`
  * dot product against a single-pass closure with the identical IEEE
  * fold, and prove bit-equality on the bench embeddings (raw doubles
  * compared, not rounded). */
object R07Dot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("r07-dot")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    val dotUdf = udf { (a: Seq[java.lang.Double], b: Seq[java.lang.Double]) =>
      if (a == null || b == null || a.length != b.length) None
      else {
        var s = 0.0; var i = 0; var ok = true
        while (ok && i < a.length) {
          val x = a(i); val y = b(i)
          if (x == null || y == null) ok = false
          else { s += x.doubleValue * y.doubleValue; i += 1 }
        }
        if (ok) Some(s) else None
      }
    }

    def exprSelf = emb.select(col("vec_id"),
      VectorOps.dot(col("embedding"), col("embedding")).as("d"))
    def udfSelf = emb.select(col("vec_id"),
      dotUdf(col("embedding"), col("embedding")).as("d"))
    // the IVF shape: 16 constant-vector dots per row
    val cents = VectorOps.deterministicCentroids(16, 64)
    def exprIvf = emb.select(col("vec_id"),
      cents.map(c => VectorOps.dot(col("embedding"), typedlit(c))).reduce(_ + _).as("d"))
    def udfIvf = emb.select(col("vec_id"),
      cents.map(c => dotUdf(col("embedding"), typedlit(c))).reduce(_ + _).as("d"))

    def time(label: String, reps: Int = 4)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R07DOT $label%-14s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("expr_self") { exprSelf.write.format("noop").mode("overwrite").save() }
    time("udf_self") { udfSelf.write.format("noop").mode("overwrite").save() }
    time("expr_ivf16") { exprIvf.write.format("noop").mode("overwrite").save() }
    time("udf_ivf16") { udfIvf.write.format("noop").mode("overwrite").save() }

    // bit-exact equality of the raw doubles (join on vec_id, compare)
    val both = exprSelf.as("e").join(udfSelf.as("u"), "vec_id")
      .filter(not(col("e.d") <=> col("u.d"))).count()
    val both2 = exprIvf.as("e").join(udfIvf.as("u"), "vec_id")
      .filter(not(col("e.d") <=> col("u.d"))).count()
    println(s"R07DOT equality self_mismatch=$both ivf_mismatch=$both2 " +
      (if (both == 0 && both2 == 0) "IDENTICAL" else "DIFFER"))
    spark.stop()
  }
}
