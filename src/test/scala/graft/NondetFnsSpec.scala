package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's nondeterministic scalar surface
  * (core_functions/scalar/random/: random, setseed, uuid) has no
  * hash-comparable oracle by definition — the contracts that ARE
  * checkable: value range, row-wise independence, uuid v4 shape and
  * uniqueness, and seeded reproducibility of Spark's rand(seed)
  * (the analog of setseed + random).
  */
class NondetFnsSpec extends AnyFunSuite {
  import TestSession._

  test("random: unit interval, row-independent; rand(seed) reproduces") {
    val df = spark.range(1000).select(rand(42).as("r"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v < 1.0))
    assert(vals.distinct.length > 990, "near-all-distinct draws")
    // setseed + random ≡ rand(seed): same seed, same stream
    val again = spark.range(1000).select(rand(42).as("r"))
      .collect().map(_.getDouble(0))
    assert(vals.sameElements(again), "seeded stream must reproduce")
  }

  test("uuid: v4 shape, per-row unique") {
    val ids = spark.range(500).select(expr("uuid()").as("u"))
      .collect().map(_.getString(0))
    assert(ids.distinct.length == 500)
    val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    ids.foreach(u => assert(v4.matches(u), s"not a v4 uuid: $u"))
  }
}
