package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for oracle-checked query builders.
  *
  * Cross-engine determinism rules (SURVEY.md §5.2/§7.5, FIXTURES.md):
  * every compared query ends in a total-order `ORDER BY`; float aggregates
  * go through the decimal-sum trick below; no rand/uuid/now in outputs.
  */
package object queries {
  /** Driver-contract query shape: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  private def pow10(scale: Int): Double = math.pow(10.0, scale.toDouble)

  /** Exact, cross-engine-stable SUM of a double expression.
    *
    * Per-row double arithmetic is IEEE-deterministic and identical in Spark
    * and DuckDB, so `floor(x*10^s + 0.5)` quantizes every row to the same
    * long in both engines (a decimal CAST would NOT — DuckDB casts
    * double→decimal via a scaled multiply while Spark goes through exact
    * BigDecimal, and they disagree near .5 boundaries). The long sum is
    * exact (no float summation-order drift across partitions/engines) and
    * stays fully distributed: partial/final long sums, no driver-side math.
    */
  def dsum(c: Column, scale: Int = 4): Column = {
    val p = pow10(scale)
    sum(floor(c * p + lit(0.5))).cast("double") / p
  }

  /** Stable AVG built from the exact quantized sum (oracle mirrors formula). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Oracle-SQL fragment matching [[dsum]]. */
  def oSum(e: String, scale: Int = 4): String = {
    val p = pow10(scale)
    s"CAST(SUM(CAST(FLOOR(($e)*$p+0.5) AS BIGINT)) AS DOUBLE)/$p"
  }

  /** Oracle-SQL fragment matching [[davg]]. */
  def oAvg(e: String, scale: Int = 4): String =
    s"${oSum(e, scale)}/COUNT($e)"

  /** Cross-engine-stable scalar rounding of a double expression: same
    * floor-based quantization as [[dsum]], as a per-row value. */
  def dround(c: Column, scale: Int = 4): Column = {
    val p = pow10(scale)
    floor(c * p + lit(0.5)).cast("double") / p
  }

  /** Oracle-SQL fragment matching [[dround]]. */
  def oRound(e: String, scale: Int = 4): String = {
    val p = pow10(scale)
    s"CAST(FLOOR(($e)*$p+0.5) AS DOUBLE)/$p"
  }
}
