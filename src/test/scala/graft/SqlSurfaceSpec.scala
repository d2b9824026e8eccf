package graft

/** Round-trip gate for the SQL-string entry surface: every
  * `SparkEntry.sqlQueries` text, run through spark.sql over the fixture
  * views, must return EXACTLY the rows of the registered builder (same
  * order — every surface query ends in a total-order ORDER BY; same
  * rendering — Row.toString covers values and nested structure).
  *
  * This is the lifecycle stage the reference drives via a HiveQL string
  * through its Driver; the builders alone exercise only the DataFrame
  * API. A surface entry that drifts from its builder (alias, quantizer,
  * filter constant) fails here, not in a downstream round.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("SQL surface is large enough to count as an entry point (>= 40)") {
    assert(SparkEntry.sqlQueries.size >= 40,
      s"only ${SparkEntry.sqlQueries.size} SQL-surface queries")
  }

  test("every SQL-surface name is a registered query") {
    val unknown = SparkEntry.sqlQueries.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"surface names with no builder: $unknown")
  }

  SparkEntry.sqlQueries.keys.toSeq.sorted.foreach { name =>
    test(s"sql surface round-trip: $name") {
      // clearCache: builders with persist barriers must not leave frames
      // that would plan-match into the SQL run (and vice versa)
      spark.catalog.clearCache()
      val viaSql = graft.queries.SqlSurface.run(spark, sfDir, name)
        .collect().toSeq.map(_.toString)
      val viaApi = SparkEntry.queries(name)(spark, sfDir)
        .collect().toSeq.map(_.toString)
      assert(viaSql == viaApi,
        s"$name: SQL surface and builder disagree " +
          s"(${viaSql.size} vs ${viaApi.size} rows; first diff: " +
          s"${viaSql.zip(viaApi).find(p => p._1 != p._2)})")
      spark.catalog.clearCache()
    }
  }
}
