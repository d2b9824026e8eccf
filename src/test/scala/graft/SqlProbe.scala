package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (test scope, not shipped): for every registered query, try
  * running its DuckDB oracle SQL through spark.sql over the fixture views
  * and compare to the builder's result — reports which oracle strings are
  * already Spark-portable, to seed the SQL-string entry surface. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
    var ok = List.empty[String]
    names.foreach { name =>
      try {
        val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().toSeq
        val viaApi = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
        if (viaSql.map(_.toString) == viaApi.map(_.toString)) {
          ok ::= name
          println(s"PORTABLE $name")
        } else println(s"MISMATCH $name (${viaSql.size} vs ${viaApi.size} rows)")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getMessage.takeWhile(_ != '\n').take(120)}")
      }
      spark.catalog.clearCache()
    }
    println(s"== portable: ${ok.size}/${names.size}")
    spark.stop()
  }
}
