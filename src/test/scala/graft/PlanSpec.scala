package graft

import org.apache.spark.sql.GraftBridge
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits: the 100 TB posture enforced as assertions.
  *
  * Correct answers with a bad plan fail here: filters must reach the
  * parquet scan, projections must prune the read schema, dims must
  * broadcast, top-N must not globally sort, and the hot paths must be
  * whole-stage-codegen'd. These are the properties that decide whether
  * a plan survives a 1000-executor 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    GraftBridge.explainString(SparkEntry.queries(name)(spark, sfDir))

  test("q02 filter+projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(l_discount,0.05)"), p)
    // pruned read: only the 5 needed columns in ReadSchema
    val rs = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(rs.contains("l_orderkey") && !rs.contains("l_partkey") &&
      !rs.contains("l_tax"), rs)
  }

  test("tpch_q6 pushes all range predicates to the scan") {
    val p = plan("tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThan(l_quantity,24.0)"), p)
  }

  test("tpch_q5 folds dims into scans: one broadcast, IN-list pushdown") {
    // r13 shape: the euro nation keys ride into the supplier/customer
    // scans as literal IN-lists (pushdown-visible) and only the
    // supplier slice broadcasts — no nation/region broadcast builds
    val p = plan("tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert(p.contains("In(s_nationkey") || p.contains("In(c_nationkey"), p)
  }

  test("theta join plans as broadcast nested loop (AM_US_JOIN analog)") {
    val p = plan("q06_theta_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("groupjoin fuses partial aggregation before a broadcast join") {
    val p = plan("q07_groupjoin")
    assert(p.contains("HashAggregate") && p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q1 is a single-shuffle aggregation") {
    val p = plan("tpch_q1")
    // one exchange for the group-by, one for the final orderBy of 4 rows
    assert("""\+- Exchange""".r.findAllIn(p).size <= 2, p)
  }

  test("top-N uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("hot aggregation path is whole-stage codegen'd") {
    // AQE defers codegen insertion to runtime stages; audit the static
    // plan with AQE off — simple mode stars codegen'd operators: *(n)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = GraftBridge.explainString(
        SparkEntry.queries("tpch_q1")(spark, sfDir), "simple")
      assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined, p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("asof join shuffles once on the equi key (no cartesian)") {
    val p = plan("q31_asof_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("banded range join is an equi join on (user, bucket)") {
    val p = plan("q32_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ANN brute force keeps the corpus unshuffled (broadcast query row)") {
    val p = plan("s01_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") &&
      p.contains("TakeOrderedAndProject"), p)
  }

  test("IVF assignment is a pure projection — zero corpus shuffles") {
    val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")
    val assigned = graft.llm.Similarity.ivfAssign(emb, "embedding", "vec_id", 8)
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"ivfAssign must not shuffle:\n$p")
    assert(!p.contains("Join"), s"ivfAssign must not join:\n$p")
  }

  test("topK custom operator runs a partial heap pass before the shuffle") {
    val p = plan("q53_topk_custom")
    val partial = p.indexOf("TopKPerGroupPartial")
    val exchange = p.indexOf("Exchange", 0)
    assert(partial >= 0, s"expected map-side partial top-K:\n$p")
    assert(exchange >= 0 && partial > exchange,
      s"partial pass must sit below the exchange:\n$p")
  }

  test("asof join carries no pair space (no join before the window)") {
    val p = plan("q31_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), s"expected running-window asof plan:\n$p")
  }
}
