package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Aggregates

/** Value-level checks for the custom aggregate-long-tail operators
  * (operators/Aggregates.scala): PRODUCT's null/empty algebra and
  * APPROX_TOP_K's exactness regime, eviction behavior, and
  * deterministic ordering — including under forced repartition so the
  * partial/merge path actually runs.
  */
class AggregatesSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("product: basic, NULL-skipping, all-NULL group") {
    val df = Seq(
      (1, Some(2.0)), (1, Some(3.0)), (1, None),
      (2, None),
      (3, Some(4.0))
    ).toDF("g", "x")
    val r = df.groupBy($"g").agg(Aggregates.product($"x").as("p"))
      .orderBy($"g").as[(Int, Option[Double])].collect().toSeq
    assert(r == Seq((1, Some(6.0)), (2, None), (3, Some(4.0))))
  }

  test("product: order-independent over exact small-int factors (merge path)") {
    // 20 factors of ≤6 per group: product ≤ 6^20 ≈ 3.7e15 < 2^53, so
    // every partial product is an exact integer and order can't matter
    val df = (1 to 200).map(i => (i % 10, ((i % 6) + 1).toDouble)).toDF("g", "x")
      .repartition(13)
    val a = df.groupBy($"g").agg(Aggregates.product($"x").as("p"))
      .orderBy($"g").as[(Int, Double)].collect().toSeq
    val b = df.repartition(3).groupBy($"g").agg(Aggregates.product($"x").as("p"))
      .orderBy($"g").as[(Int, Double)].collect().toSeq
    assert(a == b)
    // cross-check one group against a driver-side exact product
    val g0 = (1 to 200).filter(_ % 10 == 0).map(i => ((i % 6) + 1).toDouble).product
    assert(a.find(_._1 == 0).get._2 == g0)
  }

  test("approx_top_k: exact when distinct values fit in capacity") {
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(30)("c") ++
      Seq.fill(10)("d")
    val df = rows.map(v => (1, v)).toDF("g", "v").repartition(7)
    val r = df.groupBy($"g")
      .agg(Aggregates.approxTopK($"v", 3, 16).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.v", $"e.cnt").as[(String, Long)].collect().toSeq
    // count DESC, value ASC: the b/c tie breaks to b first
    assert(r == Seq(("a", 50L), ("b", 30L), ("c", 30L)))
  }

  test("approx_top_k: heavy hitter survives eviction past capacity") {
    // 1 heavy value among many singletons, capacity far below distinct
    val rows = Seq.fill(500)("hot") ++ (1 to 400).map(i => f"cold_$i%04d")
    val df = scala.util.Random.shuffle(rows).map(v => (1, v)).toDF("g", "v")
    val r = df.groupBy($"g")
      .agg(Aggregates.approxTopK($"v", 1, 8).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.v", $"e.cnt").as[(String, Long)].collect().toSeq
    assert(r.head._1 == "hot")
    // Space-Saving overestimates, never undercounts
    assert(r.head._2 >= 500L)
  }

  test("approx_top_k: NULLs are skipped, short groups return fewer than k") {
    val df = Seq((1, Some("x")), (1, None), (1, Some("x"))).toDF("g", "v")
    val r = df.groupBy($"g")
      .agg(Aggregates.approxTopK($"v", 3, 4).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.v", $"e.cnt").as[(String, Long)].collect().toSeq
    assert(r == Seq(("x", 2L)))
  }
}
