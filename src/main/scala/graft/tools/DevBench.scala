package graft.tools

import org.apache.spark.sql.SparkSession
import graft.job.{ExtractJob, Transcripts}

/** Dev-only stage timing: generation vs extraction vs ordering at a given
  * core count. Not part of the driver contract. */
object DevBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8").toInt
    val nConvs = args.lift(1).getOrElse("64000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[$cores cores] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val turns = Transcripts.generate(spark, nConvs, 20000)
    time("generate.count")(turns.count())
    time("generate+extract.count")(ExtractJob.extract(turns).count())
    spark.stop()
  }
}
