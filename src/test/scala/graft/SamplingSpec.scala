package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.sources.Catalog

/** Statistical contracts for the sampling operators (the parts a SQL
  * oracle can't check): reservoir size exactness + unbiasedness,
  * bernoulli rate, determinism under a fixed seed.
  */
class SamplingSpec extends AnyFunSuite {
  import TestSession._

  test("reservoir returns exactly n rows and is seed-deterministic") {
    val li = Catalog.table(spark, sfDir, "lineitem")
    val s1 = Sampling.reservoir(li, 200, seed = 7L)
    assert(s1.count() == 200)
    val a = s1.agg(sum("l_orderkey")).head().getLong(0)
    val b = Sampling.reservoir(li, 200, seed = 7L).agg(sum("l_orderkey")).head().getLong(0)
    assert(a == b, "same seed must give the same sample")
  }

  test("reservoir sample mean tracks the population mean") {
    val li = Catalog.table(spark, sfDir, "lineitem")
    val pop = li.agg(avg("l_quantity")).head().getDouble(0)
    val samp = Sampling.reservoir(li, 500, seed = 11L)
      .agg(avg("l_quantity")).head().getDouble(0)
    // l_quantity ∈ [1,50]; 500-row mean is within ~3σ ≈ 2.0 of pop
    assert(math.abs(samp - pop) < 2.5, s"sample mean $samp vs population $pop")
  }

  test("bernoulli keeps roughly p of the rows") {
    val o = Catalog.table(spark, sfDir, "orders")
    val n = o.count().toDouble
    val k = Sampling.bernoulli(o, 0.1, seed = 3L).count().toDouble
    assert(k / n > 0.07 && k / n < 0.13, s"rate ${k / n}")
  }

  test("bernoulli adds no shuffle (scan-side filter)") {
    val o = Catalog.table(spark, sfDir, "orders")
    val p = Sampling.bernoulli(o, 0.1).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("stratified keeps per-stratum rates and drops unlisted strata") {
    val o = Catalog.table(spark, sfDir, "orders")
    val base = o.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratified(o, col("o_orderpriority"),
        Map("1-URGENT" -> 1.0, "3-MEDIUM" -> 0.1), seed = 5L)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("1-URGENT") == base("1-URGENT"), "rate-1.0 stratum must be kept whole")
    val r = got("3-MEDIUM").toDouble / base("3-MEDIUM")
    assert(r > 0.06 && r < 0.14, s"3-MEDIUM rate $r")
    assert(!got.contains("2-HIGH"), "unlisted stratum must be dropped")
  }

  test("approx_percentile stays within 1% relative of the exact quantile") {
    val o = Catalog.table(spark, sfDir, "orders")
    val r = o.agg(
      expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.99), 10000)").as("a"),
      expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.99))").as("e")).head()
    val approx = r.getSeq[Double](0)
    val exact = r.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 0.01 * math.abs(e), s"approx $a vs exact $e")
    }
  }

  test("collated comparison is case-insensitive and codegen-friendly") {
    val c = Catalog.table(spark, sfDir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")).as("seg"))
    val ci = c.filter(collate(col("seg"), "UTF8_LCASE") === "bUiLdInG").count()
    val viaLower = c.filter(lower(col("seg")) === "building").count()
    assert(ci == viaLower && ci > 0, s"collated $ci vs lower() $viaLower")
  }
}
