package graft

/** Partitioning-determinism guard: every oracle-checked query must
  * produce IDENTICAL rows regardless of how the shuffle carves the data
  * — the property the whole DuckDB hash-compare gate silently relies on
  * (a collect_list without a sort, a tie-broken-by-arrival rank, or a
  * float sum without the quantized-long idiom all break it only
  * under a DIFFERENT partition count, which the single-config test
  * suite and Verify runs never exercise).
  *
  * Coverage (r16, verdict item 7): the registry is split into two
  * stable md5-halves — the EVEN half runs under the partition-count
  * guard (32 vs 7 shuffle partitions; 7 is prime so hash co-location
  * genuinely changes; AQE coalescing stays on, as in production), the
  * ODD half under the AQE-toggle guard — so each guard covers half the
  * registry and their union covers ALL of it; every registered query is
  * under at least one determinism guard. The conf flips use the
  * session's mutable RuntimeConfig and always restore.
  *
  * r17: an md5-keyed ~1/8 slice of each half additionally runs under
  * the OTHER half's guard (see [[overlapSlice]]), so both axes get
  * exercised on a stable cross-section of the registry.
  */
class DeterminismSpec extends SparkSpec {

  /** Run every named query under the CURRENT session conf and collect
    * its rows, fanned out on a fixed 8-thread pool (r17, verdict item
    * 6): the conf is constant for the whole phase, so concurrent
    * execution is safe — Spark's scheduler interleaves the jobs — and
    * the two-phase shape (all-baseline, flip once, all-flipped) replaces
    * the r16 per-query conf toggling, whose serialized collect pairs
    * dominated the suite's wall-clock. */
  private def collectAll(names: Seq[String]): Map[String, Array[String]] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = names.map { name =>
        Future(name -> SparkEntry.queries(name)(spark, sfDir)
          .collect().map(_.toString))
      }
      Await.result(Future.sequence(fs), 20.minutes).toMap
    } finally pool.shutdown()
  }

  private def diffPhases(names: Seq[String], a: Map[String, Array[String]],
                         b: Map[String, Array[String]]): Seq[String] =
    names.filterNot(n => a(n).sameElements(b(n)))
      .map(n => s"$n (${a(n).length} vs ${b(n).length} rows)")

  /** Stable md5-keyed half of the registry: parity 0 or 1. */
  private def stableHalf(names: Seq[String], parity: Int): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    names.sorted.filter { n =>
      val h = md.digest(n.getBytes("UTF-8"))
      ((h(0) & 0xff) % 2) == parity
    }
  }

  /** Cross-guard overlap (r17, ADVICE): an ~1/8 md5-keyed slice of the
    * OTHER half, so a stable sample of the registry runs under BOTH
    * guards — catching config-specific nondeterminism on the axis a
    * query's home half never exercises (keyed on byte 1 so the slice is
    * independent of the byte-0 half split). */
  private def overlapSlice(names: Seq[String]): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    names.filter { n =>
      val h = md.digest(n.getBytes("UTF-8"))
      ((h(1) & 0xff) % 8) == 0
    }
  }

  /** Per-commit wall-clock bound (r19, verdict item 7 — the suite's
    * second-largest sink at ~116 s ran BOTH full halves every commit):
    * unless SPARK_GRAFT_DETERMINISM=full, each guard runs a stable
    * md5-keyed QUARTER of its half plus every entry added this round
    * (the SqlSurfaceSpec convention exactly — the subset never rotates
    * silently, and a new query must not dodge the per-commit gate by
    * md5 luck). Close-of-round runs set the env var for the complete
    * both-halves sweep, so full coverage still gates every round. */
  private val fullSweep =
    sys.env.get("SPARK_GRAFT_DETERMINISM").contains("full")
  private def commitSample(names: Seq[String]): Seq[String] =
    if (fullSweep) names
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      names.filter { n =>
        ((md.digest(n.getBytes("UTF-8"))(2) & 0xff) % 4) == 0 ||
          graft.queries.SqlSurface.recentAdditions.contains(n)
      }
    }

  test("the two guard halves cover the whole registry") {
    val all = SparkEntry.queries.keys.toSeq
    assert((stableHalf(all, 0) ++ stableHalf(all, 1)).toSet == all.toSet)
  }

  test("sampled queries are AQE-toggle invariant") {
    // AQE re-plans at runtime (coalesced partitions, demoted/promoted
    // joins, skew splits); with it OFF the static plan executes as
    // written. Results must be identical either way — an operator whose
    // output depends on the adaptive re-plan (a rank over an
    // arrival-ordered frame, a cache keyed on a plan shape) fails here.
    val all = SparkEntry.queries.keys.toSeq
    val sample = commitSample(
      stableHalf(all, 1) ++ overlapSlice(stableHalf(all, 0)))
    assert(sample.size >= (if (fullSweep) 90 else 25),
      s"sample unexpectedly small: ${sample.size}")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    val baseline = collectAll(sample)
    val flipped = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      collectAll(sample)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    val failures = diffPhases(sample, baseline, flipped)
    assert(failures.isEmpty,
      s"AQE-sensitive queries: ${failures.mkString(", ")}")
  }

  test("sampled queries are partition-count invariant") {
    val all = SparkEntry.queries.keys.toSeq
    val sample = commitSample(
      stableHalf(all, 0) ++ overlapSlice(stableHalf(all, 1)))
    assert(sample.size >= (if (fullSweep) 90 else 25),
      s"sample unexpectedly small: ${sample.size}")
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    val baseline = collectAll(sample)
    val flipped = try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      collectAll(sample)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    val failures = diffPhases(sample, baseline, flipped)
    assert(failures.isEmpty,
      s"partition-count-sensitive queries: ${failures.mkString(", ")}")
  }
}
