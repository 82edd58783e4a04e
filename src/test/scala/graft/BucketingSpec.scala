package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog

/** Bucketed tables co-locate join keys at WRITE time — the 100 TB
  * answer to repeated fact-fact joins: both sides pre-hashed into the
  * same bucket layout means the join runs with NO exchange at all.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val o = Catalog.table(spark, sfDir, "orders")
    val li = Catalog.table(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_lineitem_b")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val p = GraftBridge.explainString(joined, "simple")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      // join itself needs no exchange; only the final tiny groupBy does
      assert(exchanges <= 1, p)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("tpch_q12_bucketed plans with no orderkey exchange on either fact side") {
    // the headline claim of queries/TpchBucketed.scala: the
    // lineitem⋈orders exchange is gone from the PLAN, not just fast
    val df = queries.TpchBucketed.defs.find(_.name == "tpch_q12_bucketed").get
      .run(spark, sfDir)
    val p = GraftBridge.explainString(df, "simple")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
  }

  test("tpch_q10_bucketed: fact join exchange-free, values match flat variant") {
    val bucketed = queries.TpchBucketed.defs.find(_.name == "tpch_q10_bucketed").get
      .run(spark, sfDir)
    val p = GraftBridge.explainString(bucketed, "simple")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
    val flat = queries.Tpch.defs.find(_.name == "tpch_q10").get.run(spark, sfDir)
    assert(bucketed.collect().toSeq == flat.collect().toSeq)
  }
}
