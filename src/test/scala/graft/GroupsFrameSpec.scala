package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupsFrame

/** Hand-computed GROUPS-frame semantics (peer-group-counted bounds)
  * for the RANGE-over-dense_rank rewrite, plus its one-exchange plan
  * claim.
  */
class GroupsFrameSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  // g=1: order-key groups {1:(10)}, {2:(20,30)}, {4:(40)} — the o=2
  // peer group has two rows; o jumps 2→4 to prove bounds count GROUPS
  // (adjacent distinct values), not RANGE values.
  private lazy val df = Seq(
    (1L, 1, 1, 10L), (2L, 1, 2, 20L), (3L, 1, 2, 30L),
    (4L, 1, 4, 40L), (5L, 2, 7, 5L)
  ).toDF("id", "g", "o", "x")

  test("GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING sums adjacent peer groups") {
    val r = GroupsFrame.withGroupsAgg(df, "sg", sum($"x"),
        Seq(col("g")), Seq(col("o")), 1, 1)
      .orderBy($"id").select($"id", $"sg").as[(Long, Long)].collect().toSeq
    // id1: groups {1},{2,3} → 60; id2/id3: all → 100; id4: {2,3},{4} → 90
    assert(r == Seq((1L, 60L), (2L, 100L), (3L, 100L), (4L, 90L), (5L, 5L)))
  }

  test("GROUPS 0 PRECEDING AND 0 FOLLOWING is the current peer group") {
    val r = GroupsFrame.withGroupsAgg(df, "sg", sum($"x"),
        Seq(col("g")), Seq(col("o")), 0, 0)
      .orderBy($"id").select($"id", $"sg").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 10L), (2L, 50L), (3L, 50L), (4L, 40L), (5L, 5L)))
  }

  test("rank + frame windows share one exchange") {
    val plan = org.apache.spark.sql.GraftBridge.explainString(
      GroupsFrame.withGroupsAgg(df, "sg", sum($"x"),
        Seq(col("g")), Seq(col("o")), 1, 1))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, plan)
  }

  test("negative bounds are rejected") {
    intercept[IllegalArgumentException] {
      GroupsFrame.withGroupsAgg(df, "sg", sum($"x"),
        Seq(col("g")), Seq(col("o")), -1, 1)
    }
  }
}
