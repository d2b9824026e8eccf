package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession fixture for all suites (sf0.001 fixtures). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
  override def afterAll(): Unit = () // shared session, never stopped per-suite
}

/** Driver-contract formatting: the bench line must be strict JSON. */
class BenchFormatSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("bench JSON line is parseable and locale-stable") {
    val line = Bench.jsonLine(Seq("q1" -> 1.23456, "q2" -> 0.0004), "/data/sf0.1")
    assert(line ==
      """{"metric":"total","value":1.235,"unit":"sec","queries":{"q1":1.235,"q2":0.000},"failed":[],"sf":"/data/sf0.1"}""")
    val empty = Bench.jsonLine(Nil, "/x")
    assert(empty == """{"metric":"total","value":0.000,"unit":"sec","queries":{},"failed":[],"sf":"/x"}""")
    // a failed query is excluded from the total and named in "failed"
    val withFail = Bench.jsonLine(Seq("ok" -> 2.0, "bad" -> -1.0), "/x")
    assert(withFail ==
      """{"metric":"total","value":2.000,"unit":"sec","queries":{"ok":2.000,"bad":-1.000},"failed":["bad"],"sf":"/x"}""")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
