package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** §2.1–§2.3, §2.6 core relational surface: scan / project / filter /
  * aggregate / the full join-type matrix / set ops / sorts / limits.
  *
  * Reference semantics: Hive 2.3.10 `TableScanOperator`, `SelectOperator`,
  * `FilterOperator`, `GroupByOperator`, `JoinOperator`/`MapJoinOperator`,
  * `UnionOperator`, `ReduceSinkOperator`, `LimitOperator`+`TopNHash`
  * (SURVEY.md §2.1, jar-verified; reference tree itself is only
  * /root/reference/README.md:1-4).
  *
  * Scale posture: joins are declared, Catalyst plans them — dims (region,
  * nation, customer at any realistic SF) broadcast under AQE; fact⋈fact
  * (lineitem⋈orders) shuffles on the join key, which is the correct plan at
  * 100 TB. No collect(), no driver-side loops anywhere.
  */
object Relational {

  /** Flagship: TPC-H Q1 pricing summary (scan→filter→2-phase agg→sort).
    * The filter reaches the parquet scan as a pushed predicate; aggregation
    * is partial/final HashAggregate — the exact shape that scales linearly
    * with data volume and cluster size.
    */
  val q1PricingSummary: Q = (s, dir) => {
    Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${oSum("l_quantity")} AS sum_qty,
       |${oSum("l_extendedprice")} AS sum_base_price,
       |${oSum("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
       |${oSum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
       |${oAvg("l_quantity")} AS avg_qty,
       |${oAvg("l_extendedprice")} AS avg_price,
       |${oAvg("l_discount", 6)} AS avg_disc,
       |COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> q1PricingSummary
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql
  )
}
