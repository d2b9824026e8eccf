package graft

import graft.functions.MatchPath
import graft.functions.MatchPath.{One, Plus, Star, Step}

/** Exact-value coverage for the MatchPath sequence matcher (the
  * seq_matchpath query is rows-only in the driver; semantics are pinned
  * here + via the regexp-oracled seq_matchpath_counts twin). */
class SequenceSpec extends SparkSpec {

  private def scanStr(s: String, pattern: String): Seq[(Int, String)] =
    MatchPath.scan(s.iterator, (c: Char) => c, MatchPath.compile(pattern))
      .map { case (pos, evs) => (pos, evs.mkString) }

  test("pattern compiler parses quantifiers") {
    assert(MatchPath.compile("c.v+.p") ==
      Seq(Step('c', One), Step('v', Plus), Step('p', One)))
    assert(MatchPath.compile("a*.b") == Seq(Step('a', Star), Step('b', One)))
  }

  test("matcher: greedy, leftmost, non-overlapping — regex findall twins") {
    assert(scanStr("cvvp", "c.v+.p") == Seq((0, "cvvp")))
    assert(scanStr("cvcvp", "c.v+.p") == Seq((2, "cvp")))     // restart inside candidate
    assert(scanStr("ccvp", "c.v+.p") == Seq((1, "cvp")))      // second c starts the match
    assert(scanStr("cvvepcvp", "c.v+.p") == Seq((5, "cvp")))  // e breaks the first funnel
    assert(scanStr("cvpcvvp", "c.v+.p") == Seq((0, "cvp"), (3, "cvvp"))) // non-overlap
    assert(scanStr("cp", "c.v+.p") == Seq.empty)              // + needs >= 1
    assert(scanStr("cp", "c.v*.p") == Seq((0, "cp")))         // * allows 0
    assert(scanStr("vvpp", "c.v+.p") == Seq.empty)
  }

  test("matcher window stays bounded (single-pass iterator)") {
    // a long miss-only stream must not be buffered: iterator is consumed
    // exactly once and matches at the far end are still found
    val n = 100000
    val s = ("e" * n) + "cvp"
    assert(scanStr(s, "c.v+.p") == Seq((n, "cvp")))
  }

  test("property: matcher equals regex findall on random symbol streams") {
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.oneOf('c', 'v', 'p', 'e')).map(_.mkString)
    def regexFindall(s: String, re: String): List[(Int, String)] = {
      val m = java.util.regex.Pattern.compile(re).matcher(s)
      val buf = scala.collection.mutable.ListBuffer[(Int, String)]()
      while (m.find()) buf += ((m.start, m.group))
      buf.toList
    }
    val prop = org.scalacheck.Prop.forAll(gen) { s =>
      scanStr(s, "c.v+.p") == regexFindall(s, "cv+p") &&
        scanStr(s, "c.v*.p") == regexFindall(s, "cv*p")
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("seq_matchpath emits consistent per-user funnels on fixtures") {
    val rows = SparkEntry.queries("seq_matchpath")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val idx = rs.map(_.getAs[Int]("match_idx")).sorted
      assert(idx.sameElements(1 to rs.length))        // dense match numbering
      rs.foreach(r => assert(r.getAs[Int]("n_steps") >= 3)) // c + v+ + p
    }
    // aggregated twin agrees with the per-match rows
    val counts = SparkEntry.queries("seq_matchpath_counts")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("n_steps_total"))).toMap
    val fromRows = rows.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      u -> (rs.length.toLong, rs.map(_.getAs[Int]("n_steps").toLong).sum)
    }
    assert(counts == fromRows)
  }
}
