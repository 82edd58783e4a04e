package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK
import graft.sources.Catalog

/** The custom bounded-heap TopKPerGroup operator must agree with the
  * window+filter formulation and actually plan as TopKPerGroupExec.
  */
class TopKSpec extends AnyFunSuite {
  import TestSession._

  private def viaOperator() = {
    val cust = Catalog.table(spark, sfDir, "customer")
    TopK.perGroup(cust,
      keys = Seq(col("c_mktsegment")),
      order = Seq(col("c_acctbal").desc, col("c_custkey")),
      k = 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
  }

  private def viaWindow() = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Catalog.table(spark, sfDir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
  }

  test("custom operator matches window+filter results") {
    val got = viaOperator().orderBy("c_mktsegment", "c_custkey").collect()
    val want = viaWindow().orderBy("c_mktsegment", "c_custkey").collect()
    assert(got.sameElements(want))
  }

  test("plans as TopKPerGroupExec without a sort") {
    val p = GraftBridge.explainString(viaOperator(), "simple")
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.toLowerCase.contains("sort ["), p)
  }

  test("handles k larger than any group (no truncation)") {
    val cust = Catalog.table(spark, sfDir, "customer")
    val all = TopK.perGroup(cust, Seq(col("c_mktsegment")),
      Seq(col("c_custkey")), k = 1000000)
    assert(all.count() == cust.count())
  }
}
