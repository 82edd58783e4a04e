package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Catalog

/** Salted operators must be result-identical to their plain forms —
  * salting redistributes work, never changes semantics.
  */
class SkewSpec extends AnyFunSuite {
  import TestSession._

  test("salted aggregation equals plain aggregation") {
    val ev = Catalog.table(spark, sfDir, "events")
    val plain = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000).cast("long")).as("v_units"))
      .orderBy(col("event_type")).collect()
    val salted = Skew.saltedAggregate(
      ev, Seq(col("event_type")), buckets = 8,
      partials = Seq(
        (count(lit(1)), "pn"),
        (sum(round(col("value") * 10000).cast("long")), "pv")),
      finals = Seq(
        n => sum(col(n)).as("n"),
        n => sum(col(n)).as("v_units")))
      .orderBy(col("event_type")).collect()
    assert(salted.sameElements(plain))
  }

  test("salted join equals plain join") {
    val ev = Catalog.table(spark, sfDir, "events")
    val cust = Catalog.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = ev.join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment")).collect()
    val salted = Skew.saltedJoin(ev, cust, col("user_id"), col("c_custkey"), 8)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment")).collect()
    assert(salted.sameElements(plain))
  }
}
