package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md).
  *
  * All queries take an `sfDir` and read plain parquet — no metastore needed
  * (the reference's metastore is schema-on-read over files; parquet footers
  * are self-describing, see SURVEY.md §1.1).
  *
  * Scale note: `spark.read.parquet` → `FileSourceScanExec` with native
  * column pruning + predicate pushdown; at 100 TB the same call pattern
  * works unchanged because filters/projections are declared downstream and
  * Catalyst pushes them into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One resolved relation per (session, file): what a catalog gives you —
  // repeated t() calls reuse the analyzed plan instead of re-listing the
  // path and re-reading parquet footers per query. DataFrames are
  // immutable plans, so sharing is safe.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relationCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS). Spark reads
    * it as LongType when `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench sessions); convert to a microsecond timestamp here so every
    * downstream query sees a plain TimestampType column, matching what the
    * DuckDB oracle gets from `CAST(ts AS TIMESTAMP)` (ns → µs truncation).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else t(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
