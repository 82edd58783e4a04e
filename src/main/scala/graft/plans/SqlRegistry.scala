package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, ArrayAggregate, ArrayCompact, ArrayDistinct, ArrayFilter, ArrayIntersect, ArrayJoin, ArrayMax, ArrayMin, ArraySort, Ascii, Cast, Ceil, Coalesce, Conv, CreateArray, DateAdd, DateFormatClass, DayOfWeek, Divide, EqualTo, Expression, ExpressionInfo, Floor, If, IsNaN, IsNotNull, LambdaFunction, LessThan, Literal, Multiply, Not, Or, Pmod, Signum, Size, Slice, StringLPad, Subtract, UnixTimestamp, UnresolvedNamedLambdaVariable, WeekOfYear, Year, ZipWith}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType, TimestampType}

/** The custom expression family under its REFERENCE SQL names —
  * injected into Spark's FunctionRegistry so the reference engine's
  * own query text runs verbatim through `spark.sql(...)`:
  * damerau_levenshtein, hamming/mismatches, jaccard, jaro_similarity,
  * jaro_winkler_similarity, gcd/lcm (+ long aliases), factorial-free
  * to_base (conv+lpad tree), format_bytes /
  * format_readable_decimal_size / formatReadableDecimalSize, bar,
  * unicode, plus the int8 ANN pair under graft names. A user of the
  * reference switching engines keeps their SQL.
  */
object SqlRegistry {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  private def register(e: SparkSessionExtensions, name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name, clazz), builder))

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  private def long(e: Expression): Expression = Cast(e, LongType)
  private def dbl(e: Expression): Expression = Cast(e, DoubleType)

  /** Constant-fold a numeric argument at resolution time (bar's
    * range/width are plan constants, like the reference's bind).
    */
  private def constDouble(name: String, e: Expression): Double = {
    require(e.foldable, s"$name expects a constant argument")
    Cast(e, DoubleType).eval(null).asInstanceOf[Double]
  }

  def registerAll(e: SparkSessionExtensions): Unit = {
    register(e, "damerau_levenshtein", classOf[DamerauLevenshtein],
      args => { arity("damerau_levenshtein", 2, args); DamerauLevenshtein(args(0), args(1)) })
    for (n <- Seq("hamming", "mismatches"))
      register(e, n, classOf[HammingDistance],
        args => { arity(n, 2, args); HammingDistance(args(0), args(1)) })
    register(e, "jaccard", classOf[JaccardSim],
      args => { arity("jaccard", 2, args); JaccardSim(args(0), args(1)) })
    register(e, "jaro_similarity", classOf[JaroSim],
      args => { arity("jaro_similarity", 2, args); JaroSim(args(0), args(1)) })
    register(e, "jaro_winkler_similarity", classOf[JaroWinklerSim],
      args => { arity("jaro_winkler_similarity", 2, args); JaroWinklerSim(args(0), args(1)) })
    for (n <- Seq("gcd", "greatest_common_divisor"))
      register(e, n, classOf[Gcd],
        args => { arity(n, 2, args); Gcd(long(args(0)), long(args(1))) })
    for (n <- Seq("lcm", "least_common_multiple"))
      register(e, n, classOf[Lcm],
        args => { arity(n, 2, args); Lcm(long(args(0)), long(args(1))) })
    register(e, "format_bytes", classOf[FormatBytes],
      args => { arity("format_bytes", 1, args); FormatBytes(long(args(0)), 1024L) })
    for (n <- Seq("format_readable_decimal_size", "formatReadableDecimalSize"))
      register(e, n, classOf[FormatBytes],
        args => { arity(n, 1, args); FormatBytes(long(args(0)), 1000L) })
    register(e, "bar", classOf[BarChart], args => {
      arity("bar", 4, args)
      BarChart(dbl(args(0)), constDouble("bar", args(1)),
        constDouble("bar", args(2)), constDouble("bar", args(3)))
    })
    // to_base(n, radix [, min_length]) as a conv+lpad tree
    register(e, "to_base", classOf[Conv], args => {
      require(args.length == 2 || args.length == 3,
        s"to_base expects 2 or 3 arguments, got ${args.length}")
      val conv = Conv(Cast(args(0), StringType), Literal(10), Cast(args(1), IntegerType))
      if (args.length == 2) conv
      else StringLPad(conv, Cast(args(2), IntegerType), Literal("0"))
    })
    register(e, "unicode", classOf[Ascii],
      args => { arity("unicode", 1, args); Ascii(args(0)) })
    register(e, "quantize_int8", classOf[QuantizeInt8],
      args => { arity("quantize_int8", 1, args); QuantizeInt8(args(0)) })
    register(e, "int8_cosine", classOf[Int8Cosine],
      args => { arity("int8_cosine", 2, args); Int8Cosine(args(0), args(1)) })
    register(e, "strip_accents", classOf[StripAccents],
      args => { arity("strip_accents", 1, args); StripAccents(args(0)) })
    register(e, "nfc_normalize", classOf[NfcNormalize],
      args => { arity("nfc_normalize", 1, args); NfcNormalize(args(0)) })

    // ---- date-part family as expression trees (same f39 identities,
    // now under the reference's SQL names) ----
    register(e, "dayname", classOf[DateFormatClass],
      args => { arity("dayname", 1, args)
        DateFormatClass(Cast(args(0), TimestampType), Literal("EEEE")) })
    register(e, "monthname", classOf[DateFormatClass],
      args => { arity("monthname", 1, args)
        DateFormatClass(Cast(args(0), TimestampType), Literal("MMMM")) })
    def isodowOf(d: Expression): Expression = // Mon=1 .. Sun=7
      Add(Pmod(Add(DayOfWeek(d), Literal(5)), Literal(7)), Literal(1))
    register(e, "isodow", classOf[DayOfWeek],
      args => { arity("isodow", 1, args); Cast(isodowOf(args(0)), LongType) })
    register(e, "isoyear", classOf[Year], args => {
      arity("isoyear", 1, args)
      // ISO year = calendar year of this week's Thursday
      Cast(Year(DateAdd(args(0), Subtract(Literal(4), isodowOf(args(0))))), LongType)
    })
    register(e, "century", classOf[Year], args => {
      arity("century", 1, args)
      Cast(Add(Floor(Divide(Cast(Subtract(Year(args(0)), Literal(1)), DoubleType), Literal(100.0))),
        Literal(1L)), LongType)
    })
    register(e, "decade", classOf[Year], args => {
      arity("decade", 1, args)
      Cast(Floor(Divide(Cast(Year(args(0)), DoubleType), Literal(10.0))), LongType)
    })
    register(e, "epoch_ms", classOf[UnixTimestamp], args => {
      arity("epoch_ms", 1, args)
      Multiply(UnixTimestamp(Cast(args(0), TimestampType),
        Literal("yyyy-MM-dd HH:mm:ss")), Literal(1000L))
    })
    register(e, "yearweek", classOf[WeekOfYear], args => {
      arity("yearweek", 1, args)
      // ISO year (Thursday-of-week) * 100 + ISO week — crosses year
      // boundaries together (2021-01-01 → 202053)
      val isoyear = Year(DateAdd(args(0), Subtract(Literal(4), isodowOf(args(0)))))
      Cast(Add(Multiply(isoyear, Literal(100)), WeekOfYear(args(0))), LongType)
    })

    // ---- list family as expression trees (the f49 identities under
    // the reference's SQL names; lambdas built with unresolved
    // lambda variables, resolved by the analyzer like any HOF) ----
    def lambda1(body: Expression => Expression): LambdaFunction = {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      LambdaFunction(body(x), Seq(x))
    }
    def lambda2(body: (Expression, Expression) => Expression): LambdaFunction = {
      val a = UnresolvedNamedLambdaVariable(Seq("a"))
      val b = UnresolvedNamedLambdaVariable(Seq("b"))
      LambdaFunction(body(a, b), Seq(a, b))
    }
    register(e, "list_value", classOf[CreateArray],
      args => CreateArray(args))
    register(e, "list_unique", classOf[ArrayDistinct], args => {
      arity("list_unique", 1, args)
      // distinct NON-NULL element count (reference list/functions.json)
      Cast(Size(ArrayDistinct(ArrayCompact(args(0)))), LongType)
    })
    register(e, "list_intersect", classOf[ArrayIntersect],
      args => { arity("list_intersect", 2, args); ArrayIntersect(args(0), args(1)) })
    register(e, "list_sort", classOf[ArraySort],
      args => { arity("list_sort", 1, args); new ArraySort(args(0)) })
    register(e, "array_to_string", classOf[ArrayJoin],
      args => { arity("array_to_string", 2, args); ArrayJoin(args(0), args(1), None) })
    for (n <- Seq("array_slice", "list_slice"))
      register(e, n, classOf[Slice], args => {
      // full reference semantics (1-based INCLUSIVE bounds, negative
      // indices, clamping, optional 4th step arg) live in DuckSlice
      require(args.length == 3 || args.length == 4,
        s"$n expects 3 or 4 arguments, got ${args.length}")
      DuckSlice(args(0), args(1), args(2), args.lift(3),
        loEmpty = false, hiEmpty = false)
    })
    for (n <- Seq("list_aggregate", "list_aggr", "array_aggregate", "array_aggr"))
      register(e, n, classOf[ArrayAggregate], args => {
      arity(n, 2, args)
      require(args(1).foldable, s"$n expects a constant function name")
      val fn = args(1).eval(null).toString
      fn match {
        case "sum" =>
          ArrayAggregate(Cast(args(0), ArrayType(LongType)), Literal(0L),
            lambda2(Add(_, _)), lambda1(identity))
        case "min" => ArrayMin(args(0))
        case "max" => ArrayMax(args(0))
        case "count" => Cast(Size(ArrayCompact(args(0))), LongType)
        case other => throw new IllegalArgumentException(
          s"list_aggregate: unsupported function '$other' (sum/min/max/count)")
      }
    })
    register(e, "list_where", classOf[ZipWith], args => {
      arity("list_where", 2, args)
      // mask gather: zip values with booleans, keep where the mask
      // holds (NULL mask drops, matching the reference)
      ArrayFilter(
        ZipWith(args(0), args(1),
          lambda2((v, m) => If(Coalesce(Seq(m, Literal(false))), v, Literal(null)))),
        lambda1(IsNotNull))
    })

    // ---- F60/F63–F65 fringe under reference names (this file is the
    // SQL front door; the Column API lives in NumericFringe /
    // UnicodeFns) ----
    register(e, "left_grapheme", classOf[LeftGrapheme],
      args => { arity("left_grapheme", 2, args); LeftGrapheme(args(0), long(args(1))) })
    register(e, "right_grapheme", classOf[RightGrapheme],
      args => { arity("right_grapheme", 2, args); RightGrapheme(args(0), long(args(1))) })
    register(e, "nextafter", classOf[NextAfter],
      args => { arity("nextafter", 2, args); NextAfter(dbl(args(0)), dbl(args(1))) })
    register(e, "md5_number", classOf[Md5Number],
      args => { arity("md5_number", 1, args); Md5Number(args(0)) })
    register(e, "md5_number_lower", classOf[Md5NumberHalf],
      args => { arity("md5_number_lower", 1, args); Md5NumberHalf(args(0), lower = true) })
    register(e, "md5_number_upper", classOf[Md5NumberHalf],
      args => { arity("md5_number_upper", 1, args); Md5NumberHalf(args(0), lower = false) })
    register(e, "gamma", classOf[GammaFn],
      args => { arity("gamma", 1, args); GammaFn(dbl(args(0))) })
    register(e, "lgamma", classOf[LogGammaFn],
      args => { arity("lgamma", 1, args); LogGammaFn(dbl(args(0))) })
    register(e, "bit_position", classOf[BitPositionQuirk],
      args => { arity("bit_position", 2, args); BitPositionQuirk(args(0), args(1)) })
    // composed trees over Spark primitives — even / signbit /
    // isfinite / isinf (isnan is a Spark native already)
    register(e, "even", classOf[Ceil], args => {
      arity("even", 1, args)
      val x = dbl(args(0))
      Add(
        Multiply(
          Cast(Multiply(Ceil(Divide(Abs(x), Literal(2.0))), Literal(2L)), DoubleType),
          Signum(x)),
        Literal(0.0)) // normalize Java's -0.0 for the zero row
    })
    register(e, "signbit", classOf[LessThan],
      args => { arity("signbit", 1, args); LessThan(dbl(args(0)), Literal(0.0)) })
    register(e, "isinf", classOf[Abs], args => {
      arity("isinf", 1, args)
      EqualTo(Abs(dbl(args(0))), Literal(Double.PositiveInfinity))
    })
    register(e, "isfinite", classOf[Abs], args => {
      arity("isfinite", 1, args)
      Not(Or(IsNaN(dbl(args(0))),
        EqualTo(Abs(dbl(args(0))), Literal(Double.PositiveInfinity))))
    })
    // ---- aggregate fringe under reference names: the analyzer wraps
    // a bare AggregateFunction in AggregateExpression itself, so the
    // builders return the raw aggregate (same as Spark's built-ins)
    for (n <- Seq("kahan_sum", "fsum", "sumkahan"))
      register(e, n, classOf[graft.operators.KahanSumAgg],
        args => { arity(n, 1, args); graft.operators.KahanSumAgg(dbl(args(0))) })
    register(e, "reservoir_quantile", classOf[graft.operators.ReservoirQuantileAgg], args => {
      arity("reservoir_quantile", 3, args)
      graft.operators.ReservoirQuantileAgg(dbl(args(0)),
        constDouble("reservoir_quantile", args(1)),
        constDouble("reservoir_quantile", args(2)).toInt)
    })
  }
}
