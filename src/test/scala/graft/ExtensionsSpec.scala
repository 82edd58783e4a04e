package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupJoinRule

/** GroupJoin optimizer rule: the "GROUP BY feeding a JOIN" plan is
  * rewritten to aggregate-below-join when enabled, results unchanged.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  // orders grouped per customer, then joined to customer — written in
  // the NAIVE order (join first, then aggregate), the shape the fork's
  // GROUPJOIN targets.
  private def naive() = {
    val o = graft.sources.Catalog.table(spark, sfDir, "orders")
    val c = graft.sources.Catalog.table(spark, sfDir, "customer")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
  }

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set(GroupJoinRule.ConfKey, on.toString)
    try f finally spark.conf.set(GroupJoinRule.ConfKey, "false")
  }

  private def optimized(explain: String): String =
    explain.split("== Optimized Logical Plan ==")(1)
      .split("== Physical Plan ==")(0)
      .replaceAll("#\\d+L?", "#x") // exprIds differ per plan build

  test("rule pushes the aggregate below the join") {
    val on = withRule(true)(GraftBridge.explainString(naive(), "extended"))
    // optimized logical plan: Join above Aggregate (fused), not below
    val opt = optimized(on)
    val joinIdx = opt.indexOf("Join")
    val aggIdx = opt.indexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"expected Aggregate below Join after fusion:\n$opt")
  }

  test("rule preserves results exactly") {
    val expect = withRule(false)(naive().orderBy("o_custkey").collect())
    val got = withRule(true)(naive().orderBy("o_custkey").collect())
    assert(got.sameElements(expect))
  }

  test("rule fuses when the group key is NOT in the select list") {
    // GROUP BY o_custkey with only SUM(x) projected: the rewritten
    // join condition references o_custkey, which must be appended to
    // the pushed aggregate's output (and stripped by the outer
    // Project) or the plan fails to bind.
    val o = graft.sources.Catalog.table(spark, sfDir, "orders")
    val c = graft.sources.Catalog.table(spark, sfDir, "customer")
    def q() = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select(col("cents"))
    val expect = withRule(false)(q().orderBy("cents").collect())
    val got = withRule(true)(q().orderBy("cents").collect())
    assert(got.sameElements(expect))
    val opt = optimized(withRule(true)(GraftBridge.explainString(
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents")), "extended")))
    val joinIdx = opt.indexOf("Join")
    val aggIdx = opt.indexOf("Aggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"expected fusion with unprojected key:\n$opt")
  }

  test("rule leaves non-fusable aggregates alone (agg over dim column)") {
    val o = graft.sources.Catalog.table(spark, sfDir, "orders")
    val c = graft.sources.Catalog.table(spark, sfDir, "customer")
    def q() = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(max(col("c_acctbal")).as("m")) // references the dim side
    val off = optimized(withRule(false)(GraftBridge.explainString(q(), "extended")))
    val on = optimized(withRule(true)(GraftBridge.explainString(q(), "extended")))
    assert(off == on, s"rule must not fire when aggregates touch the dim side\noff:$off\non:$on")
  }
}
