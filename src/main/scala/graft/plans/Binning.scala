package graft.plans

/** equi_width_bins + histogram_exact (reference:
  * src/function/scalar/generic/binning.cpp and
  * src/core_functions/aggregate/nested/binned_histogram.cpp).
  *
  * These post-date the oracle engine build the driver ships, so the
  * cross-engine gate cannot run them — the mirrors below are
  * line-faithful translations of binning.cpp (hugeint arithmetic as
  * BigInt, std::round's half-AWAY-from-zero as `cround`), and
  * BinningSpec pins hand-derived traces of the same code paths
  * (nice-step selection between the ×2 and ×5 divisor grids, CEILING
  * max snap, the ×2 bin-count allowance, per-step re-rounding of
  * double boundaries).
  */
object Binning {

  // ---- integer variant (binning.cpp EquiWidthBinsInteger) ----

  private def prevPowerOfTen(input: BigInt): BigInt = {
    var p = BigInt(1)
    while (p < input) p *= 10
    p / 10
  }

  private def roundToNumber(input: BigInt, num: BigInt, ceil: Boolean): BigInt =
    if (ceil) (input + (num - 1)) / num * num
    else (input + (num / 2)) / num * num

  private def makeNice(input: BigInt, step: BigInt, ceil: Boolean): BigInt = {
    val p = prevPowerOfTen(step)
    var two = p * 2
    var five = p
    if (p * 3 <= step) two *= 5
    if (p * 2 <= step) five *= 5
    val rTwo = roundToNumber(input, two, ceil)
    val rFive = roundToNumber(input, five, ceil)
    if ((input - rTwo).abs < (input - rFive).abs) rTwo else rFive
  }

  /** Ascending bin boundaries for BIGINT inputs. */
  def equiWidthBinsLong(inputMin: Long, inputMax: Long, binCount0: Int,
      nice: Boolean): Seq[Long] = {
    require(inputMax > inputMin, "equi_width_bins: max must exceed min")
    require(binCount0 > 0, "equi_width_bins: bin count must be positive")
    val Factor = BigInt(1000)
    val min = BigInt(inputMin) * Factor
    var max = BigInt(inputMax) * Factor
    var step = (max - min) / binCount0
    var binCount = BigInt(binCount0)
    if (nice) {
      val newStep = makeNice(step, step, ceil = false)
      val newMax = roundToNumber(max, newStep, ceil = true)
      if (newMax != min && newStep != 0) { max = newMax; step = newStep }
      binCount *= 2
    }
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var b = max
    var done = false
    while (!done && b > min) {
      val real = (b / Factor).toLong
      if (out.nonEmpty && (real < inputMin || out.length >= binCount)) done = true
      else if (out.nonEmpty && real == out.last) () // skip duplicate
      else out += real
      b -= step
    }
    out.toSeq.reverse
  }

  // ---- double variant (binning.cpp EquiWidthBinsDouble) ----

  private def prevPowerOfTen(input: Double): Double = {
    var p = 1.0
    if (input < 1) {
      while (p > input) p /= 10
      p
    } else {
      while (p < input) p *= 10
      p / 10
    }
  }

  /** std::round — halves away from zero. */
  private def cround(x: Double): Double =
    if (x < 0) -math.floor(-x + 0.5) else math.floor(x + 0.5)

  private def roundToNumber(input: Double, num: Double, ceil: Boolean): Double = {
    val r = if (ceil) math.ceil(input / num) * num else cround(input / num) * num
    if (r.isInfinite || r.isNaN) input else r
  }

  private def makeNice(input: Double, step: Double, ceil: Boolean): Double = {
    if (input == 0) return 0
    val p = prevPowerOfTen(step)
    var two = p * 2
    var five = p
    if (p * 3 <= step) two *= 5
    if (p * 2 <= step) five *= 5
    val rTwo = roundToNumber(input, two, ceil)
    val rFive = roundToNumber(input, five, ceil)
    if (math.abs(input - rTwo) < math.abs(input - rFive)) rTwo else rFive
  }

  /** Ascending bin boundaries for DOUBLE inputs. */
  def equiWidthBinsDouble(min: Double, inputMax: Double, binCount0: Int,
      nice: Boolean): Seq[Double] = {
    require(!min.isInfinite && !min.isNaN && !inputMax.isInfinite && !inputMax.isNaN,
      "equi_width_bins does not support infinite or nan as min/max value")
    require(inputMax > min, "equi_width_bins: max must exceed min")
    require(binCount0 > 0, "equi_width_bins: bin count must be positive")
    var max = inputMax
    val span = max - min
    var step =
      if (span.isInfinite) max / binCount0 - min / binCount0
      else span / binCount0
    val stepPowerOfTen = prevPowerOfTen(step)
    var binCount = binCount0.toLong
    if (nice) {
      step = makeNice(step, step, ceil = false)
      max = roundToNumber(inputMax, step, ceil = true)
      binCount *= 2
    }
    require(step != 0, "step is 0")
    val roundMult = 10 / stepPowerOfTen
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    var b = max
    var done = false
    while (!done && b > min) {
      // re-round every boundary: repeated FP subtraction drifts
      val real = if (nice) cround(b * roundMult) / roundMult else b
      if (out.nonEmpty && out.last == real) () // skip duplicate
      else if (real <= min || out.length >= binCount) done = true
      else out += real
      b -= step
    }
    out.toSeq.reverse
  }
}
