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
}
