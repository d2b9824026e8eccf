package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway kernel probe: native md5_prefix vs the conv(substring(md5))
  * chain over the same generated words. Not part of the suite. */
object HashPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(3000000L)
      .select(concat(lit("word_"), col("id")).as("w"))
      .persist()
    df.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to 3) {
      time("old chain ") {
        df.select(conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long").as("b"))
          .write.format("noop").mode("overwrite").save()
      }
      time("md5_prefix") {
        df.select(call_function("md5_prefix", col("w"), lit(4)).as("b"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
