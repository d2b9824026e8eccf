package graft

/** Partitioning-determinism guard: every oracle-checked query must
  * produce IDENTICAL rows regardless of how the shuffle carves the data
  * — the property the whole DuckDB hash-compare gate silently relies on
  * (a collect_list without a sort, a tie-broken-by-arrival rank, or a
  * float sum without the quantized-long idiom all break it only
  * under a DIFFERENT partition count, which the single-config test
  * suite and Verify runs never exercise).
  *
  * A stable ~quarter sample of the registry (md5 of the name — the
  * catalogued deterministic-sampling idiom) runs once at the session's
  * 32 shuffle partitions and once at 7 (prime, so hash co-location
  * patterns genuinely change; AQE coalescing stays on, as in
  * production), comparing full row renderings. The conf flip uses the
  * session's mutable RuntimeConfig and always restores.
  */
class DeterminismSpec extends SparkSpec {

  private def stableSample(names: Seq[String]): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    names.sorted.filter { n =>
      val h = md.digest(n.getBytes("UTF-8"))
      ((h(0) & 0xff) % 4) == 0
    }
  }

  test("sampled queries are AQE-toggle invariant") {
    // AQE re-plans at runtime (coalesced partitions, demoted/promoted
    // joins, skew splits); with it OFF the static plan executes as
    // written. Results must be identical either way — an operator whose
    // output depends on the adaptive re-plan (a rank over an
    // arrival-ordered frame, a cache keyed on a plan shape) fails here.
    val md = java.security.MessageDigest.getInstance("MD5")
    val sample = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val h = md.digest(n.getBytes("UTF-8"))
      ((h(0) & 0xff) % 8) == 1
    }
    assert(sample.size >= 15, s"sample unexpectedly small: ${sample.size}")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      sample.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.conf.set("spark.sql.adaptive.enabled", prior)
        val a = fn(spark, sfDir).collect().map(_.toString)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val b = fn(spark, sfDir).collect().map(_.toString)
        if (!a.sameElements(b))
          failures += s"$name (${a.length} vs ${b.length} rows)"
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert(failures.isEmpty,
      s"AQE-sensitive queries: ${failures.mkString(", ")}")
  }

  test("sampled queries are partition-count invariant") {
    val sample = stableSample(SparkEntry.queries.keys.toSeq)
    assert(sample.size >= 30, s"sample unexpectedly small: ${sample.size}")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      sample.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        val a = fn(spark, sfDir).collect().map(_.toString)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = fn(spark, sfDir).collect().map(_.toString)
        if (!a.sameElements(b))
          failures += s"$name (${a.length} vs ${b.length} rows)"
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert(failures.isEmpty,
      s"partition-count-sensitive queries: ${failures.mkString(", ")}")
  }
}
