package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus (beyond-inventory; the dedup family's
  * connected components — `llm_dedup_cc` — already lives in Text.scala).
  *
  * PageRank is the canonical iterative distributed graph workload (Page et
  * al. 1999; the Pregel/GraphX reference algorithm). Here it runs over a
  * deterministic synthetic link graph derived from `documents` so both
  * engines build the identical edge set: each doc emits 3 out-links whose
  * targets are md5-hash-derived (`conv(substr(md5(src:i),1,8),16,10) % N`
  * — the catalogued cross-engine bucketing idiom; doc_ids are contiguous
  * 0..N-1 in every fixture, so the mod always lands on a real node).
  *
  * Scale shape: each of the 5 unrolled iterations is one shuffle-join of
  * the static edge list with the current rank vector plus one groupBy on
  * the destination — the exact dataflow of PageRank on any cluster, with
  * per-iteration cost O(|E|/cores). Nothing collects to the driver; the
  * rank vector is never a driver-side artifact (unlike a model table, it
  * is O(N)). Out-degree is constant (3) so there are no dangling nodes
  * and no skew; hot DESTINATIONS (many in-links) are absorbed by the
  * two-phase partial sum in the groupBy.
  *
  * Cross-engine determinism: per-iteration ranks are quantized with the
  * shared `dsum`/`dround` long-quantization helpers (1e-9), so float
  * summation order cannot drift between Spark partials and DuckDB; the
  * per-row `rank/3.0` and `0.15/n + 0.85*s` arithmetic is identical IEEE
  * double math in both engines.
  */
object Graph {

  private val Iterations = 5
  private val OutDeg = 3

  /** 5-iteration PageRank (damping 0.85) over the md5-derived doc graph. */
  val pagerank: Q = (s, dir) => {
    val ids = Tables.t(s, dir, "documents").select(col("doc_id"))
    val nDf = ids.agg(count(lit(1)).cast("double").as("n"))
    // carry N as a broadcast-joined column: no driver-side collect, and the
    // 0.15/n teleport term stays in-plan at any corpus size
    val base = ids.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"), col("n"),
        explode(array((1 to OutDeg).map(lit): _*)).as("i"))
      .select(col("src"),
        pmod(conv(substring(md5(concat_ws(":", col("src"), col("i"))), 1, 8),
          16, 10).cast("long"), col("n").cast("long")).as("dst"))
    var ranks = base.select(col("doc_id"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to Iterations) {
      val contribs = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"),
          (col("rank") / lit(OutDeg.toDouble)).as("c"))
      ranks = base
        .join(contribs, Seq("doc_id"), "left")
        .groupBy(col("doc_id"), col("n"))
        .agg(dsum(coalesce(col("c"), lit(0.0)), 9).as("sc"))
        .select(col("doc_id"),
          dround(lit(0.15) / col("n") + lit(0.85) * col("sc"), 9).as("rank"))
    }
    ranks.orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> pagerank
  )

  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS MATERIALIZED (
       |  SELECT i.doc_id,
       |    ${oRound(s"0.15/(SELECT n FROM nn) + 0.85*(${oSum("COALESCE(c.c, 0.0)", 9)})", 9)} AS rank
       |  FROM ids i LEFT JOIN (
       |    SELECT e.dst AS doc_id, r.rank/3.0 AS c
       |    FROM edges e JOIN $prev r ON r.doc_id = e.src) c
       |  ON c.doc_id = i.doc_id
       |  GROUP BY i.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> {
      val iters = (1 to Iterations)
        .map(k => iterSql(s"r${k - 1}", s"r$k")).mkString(",\n")
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ids),
         |edges AS MATERIALIZED (
         |  SELECT ids.doc_id AS src,
         |    (('0x' || substr(md5(ids.doc_id || ':' || t.i), 1, 8))::BIGINT
         |      % (SELECT CAST(n AS BIGINT) FROM nn)) AS dst
         |  FROM ids, (VALUES (1), (2), (3)) AS t(i)),
         |r0 AS (SELECT doc_id, 1.0/(SELECT n FROM nn) AS rank FROM ids),
         |$iters
         |SELECT doc_id, rank FROM r$Iterations ORDER BY doc_id""".stripMargin
    }
  )
}
