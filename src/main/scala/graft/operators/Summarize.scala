package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SUMMARIZE — one-pass table profiling, the reference's statement
  * (/root/reference/src/planner/binder/statement/bind_summarize.cpp
  * rewrites SUMMARIZE t into one aggregation over every column,
  * unnested to a row per column) re-expressed as a Catalyst plan: ONE
  * wide aggregate (every per-column stat is a parallel aggregate
  * expression over the same scan) followed by a stack() unpivot of the
  * single result row. The table is read once regardless of width.
  *
  * Portability choices vs the reference's output, by design:
  *  - `n_distinct` is EXACT (COUNT(DISTINCT)) in [[summarize]] so the
  *    result is oracle-checkable; the reference uses approx_unique.
  *    Exact multi-column distinct costs Catalyst an Expand (input
  *    amplified ×(#distinct aggs)) — fine for profiling runs; at
  *    100 TB use [[summarizeApprox]], which swaps in HLL
  *    approx_count_distinct and stays a single expand-free pass.
  *  - numeric min/max/avg surface as DOUBLE, string min/max as STRING,
  *    timestamps as epoch microseconds — never stringified doubles
  *    (engines format them differently; values, not renderings).
  *  - avg follows functions.Exact: integral columns sum exactly in
  *    int64, fractional columns in fixed-point units, so the double
  *    result is engine-portable bit-for-bit.
  */
object Summarize {

  /** Per-column stat row layout: (column_name, n_rows, n_null,
    * n_distinct, min_num, max_num, avg_num, min_str, max_str).
    */
  def summarize(df: DataFrame, fractionalScale: Int = 4): DataFrame =
    build(df, exact = true, fractionalScale)

  /** The 100 TB variant: HLL distinct (no Expand), same layout. */
  def summarizeApprox(df: DataFrame, fractionalScale: Int = 4): DataFrame =
    build(df, exact = false, fractionalScale)

  private def build(df: DataFrame, exact: Boolean, scale: Int): DataFrame = {
    require(scale >= 0 && scale <= 18, s"fractionalScale out of range: $scale")
    val fields = df.schema.fields
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val x = col(f.name)
      val distinct =
        if (exact) countDistinct(x) else approx_count_distinct(x)
      val (minN, maxN, avgN) = f.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
          (x.cast("double"), x.cast("double"),
            Some(sum(x.cast("long")).cast("double") / count(x)))
        case _: FloatType | _: DoubleType | _: DecimalType =>
          // decimal-sum avg (exact, order-independent, sign-safe) —
          // the oracle uses the identical CAST chain
          (x.cast("double"), x.cast("double"),
            Some(sum(x.cast(DecimalType(18, scale))).cast("double") / count(x)))
        case _: TimestampType =>
          val us = unix_micros(x)
          (us.cast("double"), us.cast("double"), None)
        case _: DateType =>
          val d = datediff(x, lit("1970-01-01").cast("date"))
          (d.cast("double"), d.cast("double"), None)
        case _ => (lit(null).cast("double"), lit(null).cast("double"), None)
      }
      val (minS, maxS) = f.dataType match {
        case _: StringType => (x, x)
        case _             => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        count(lit(1)).as(s"__c$i"),
        (count(lit(1)) - count(x)).as(s"__n$i"),
        distinct.as(s"__d$i"),
        min(minN).as(s"__mn$i"),
        max(maxN).as(s"__mx$i"),
        avgN.getOrElse(lit(null).cast("double")).as(s"__av$i"),
        min(minS).as(s"__ms$i"),
        max(maxS).as(s"__xs$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    // unpivot the single wide row: stack(n, 'name0', c0, ...) — plan
    // construction is driver-side, execution a one-row projection.
    // Column NAMES are quoted into the stack expression; values ride
    // as column references — nothing user-controlled is spliced.
    val stackArgs = fields.zipWithIndex.map { case (f, i) =>
      val nm = f.name.replace("'", "''")
      s"'$nm', __c$i, __n$i, __d$i, __mn$i, __mx$i, __av$i, __ms$i, __xs$i"
    }
    wide.selectExpr(
        s"stack(${fields.length}, ${stackArgs.mkString(", ")}) AS " +
          "(column_name, n_rows, n_null, n_distinct, " +
          "min_num, max_num, avg_num, min_str, max_str)")
      .orderBy(col("column_name"))
  }

  /** The reference's OWN column layout (bind_summarize.cpp):
    * (column_name, column_type, min, max, approx_unique, avg, std,
    * q25, q50, q75, count, null_percentage) — min/max/avg/std/q25..q75
    * rendered as VARCHAR like the reference, approx_unique via HLL,
    * quantiles approximate (both engines'are; values engine-specific,
    * so this layout is spec-gated while [[summarize]]'s typed split
    * stays the oracle-exact surface). Same single-pass plan: one wide
    * aggregate, a one-row stack unpivot, rows in SCHEMA order like the
    * reference (not sorted).
    */
  def summarizeRef(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def s(c: Column): Column = c.cast("string")
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val x = col(f.name)
      val isNum = f.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
             _: FloatType | _: DoubleType | _: DecimalType => true
        case _ => false
      }
      val nullStr = lit(null).cast("string")
      def q(p: Double): Column =
        if (isNum) s(expr(s"approx_percentile(`${f.name}`, $p)")) else nullStr
      Seq(
        s(min(x)).as(s"__mn$i"),
        s(max(x)).as(s"__mx$i"),
        approx_count_distinct(x).as(s"__au$i"),
        (if (isNum) s(avg(x.cast("double"))) else nullStr).as(s"__av$i"),
        (if (isNum) s(stddev_samp(x.cast("double"))) else nullStr).as(s"__sd$i"),
        q(0.25).as(s"__q1$i"), q(0.5).as(s"__q2$i"), q(0.75).as(s"__q3$i"),
        count(lit(1)).as(s"__c$i"),
        round(lit(100.0) * (count(lit(1)) - count(x)) / count(lit(1)), 2)
          .cast(DecimalType(5, 2)).as(s"__np$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stackArgs = fields.zipWithIndex.map { case (f, i) =>
      val nm = f.name.replace("'", "''")
      val ty = graft.queries.DuckTypes.name(f.dataType).replace("'", "''")
      s"'$nm', '$ty', __mn$i, __mx$i, __au$i, __av$i, __sd$i, " +
        s"__q1$i, __q2$i, __q3$i, __c$i, __np$i"
    }
    wide.selectExpr(
      s"stack(${fields.length}, ${stackArgs.mkString(", ")}) AS " +
        "(column_name, column_type, min, max, approx_unique, avg, std, " +
        "q25, q50, q75, count, null_percentage)")
  }
}
