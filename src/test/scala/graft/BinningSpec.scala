package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Binning

/** Hand-derived traces of the reference's binning.cpp code paths —
  * each expected vector was walked through the C++ by hand (hugeint
  * FACTOR=1000 arithmetic, nice-step choice between the ×2 and ×5
  * divisor grids, CEILING max snap, per-step double re-rounding).
  */
class BinningSpec extends AnyFunSuite {

  test("integer bins, plain: even split, ascending, min never emitted") {
    assert(Binning.equiWidthBinsLong(0, 10, 5, nice = false) === Seq(2, 4, 6, 8, 10))
    assert(Binning.equiWidthBinsLong(0, 10, 2, nice = false) === Seq(5, 10))
    // span not divisible: FACTOR-scaled arithmetic keeps boundaries exact
    assert(Binning.equiWidthBinsLong(0, 10, 3, nice = false) === Seq(3, 6, 10))
  }

  test("integer bins, nice rounding snaps step and max to the 2/5 grid") {
    // step 2000 (scaled) is already nice → unchanged
    assert(Binning.equiWidthBinsLong(0, 10, 5, nice = true) === Seq(2, 4, 6, 8, 10))
    // (0,97,5): step 19400 → nice 20000, max 97000 → ceil 100000
    assert(Binning.equiWidthBinsLong(0, 97, 5, nice = true) === Seq(20, 40, 60, 80, 100))
  }

  test("double bins, plain and nice") {
    assert(Binning.equiWidthBinsDouble(0.0, 1.0, 4, nice = false)
      === Seq(0.25, 0.5, 0.75, 1.0))
    // step 0.25 → nice 0.2 (×2 grid beats ×5), max ceils to 1.0,
    // boundaries re-rounded at every step
    assert(Binning.equiWidthBinsDouble(0.0, 1.0, 4, nice = true)
      === Seq(0.2, 0.4, 0.6, 0.8, 1.0))
  }

  test("invalid inputs reject") {
    intercept[IllegalArgumentException](Binning.equiWidthBinsLong(5, 5, 3, nice = false))
    intercept[IllegalArgumentException](Binning.equiWidthBinsLong(0, 10, 0, nice = false))
    intercept[IllegalArgumentException](
      Binning.equiWidthBinsDouble(0.0, Double.PositiveInfinity, 3, nice = false))
  }
}
