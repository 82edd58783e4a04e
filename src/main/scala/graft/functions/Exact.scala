package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Engine-portable exact aggregation helpers.
  *
  * Floating-point SUM/AVG are order-dependent, and a distributed engine
  * never guarantees reduction order — so a double aggregate can differ
  * between Spark and any oracle engine (and between two runs at
  * different parallelism). The fix, applied uniformly across this
  * library: route every aggregated double through an exact
  * DECIMAL(18,s) cast, sum in decimal (exact, order-independent), and
  * cast the final value back to double. The matching oracle SQL uses
  * the identical casts, so results are bit-identical by construction.
  *
  * This is also the right call at 100 TB: decimal partial aggregates
  * stay in Tungsten codegen and make results reproducible run-to-run.
  */
object Exact {
  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** SQL fragment matching [[dsum]] — keep in lock-step. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact mean: decimal sum divided by count (both order-independent). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1))

  def davgSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)/COUNT(*)"

  /** Sum that is 0.0 (not NULL) over an empty group — for outer joins. */
  def dsum0(c: Column, scale: Int = 2): Column =
    coalesce(sum(c.cast(DecimalType(18, scale))).cast(DoubleType), lit(0.0))

  def dsum0Sql(expr: String, scale: Int = 2): String =
    s"COALESCE(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE), 0.0)"
}
