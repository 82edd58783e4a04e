package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Name-level aliases for the reference's core-function surface
  * (/root/reference/src/core_functions/&#42;&#42;/functions.json) whose
  * SEMANTICS Spark already has under a different spelling. Each alias
  * is either a rename onto a built-in (resolved by the analyzer via
  * [[UnresolvedFunction]] on its next fixed-point iteration) or a
  * small expression tree over built-ins — no new execution code, so
  * every alias inherits whole-stage codegen from its target.
  *
  * Registered semantics were pinned against DuckDB one by one (see
  * AliasesSpec for the literal checks): strpos is 1-based/0-absent =
  * instr; week is ISO = weekofyear; microsecond/millisecond include
  * the whole seconds component (Postgres EXTRACT convention);
  * epoch is fractional DOUBLE seconds; arg_max/min = max_by/min_by;
  * kurtosis_pop = Spark's kurtosis (population excess);
  * list_distinct also drops NULLs; array_unique COUNTS distinct
  * non-null elements; strftime/strptime %-codes translate to java
  * patterns at bind time (constant formats — the reference binds the
  * format once per query too).
  *
  * Deliberately NOT aliased, with reasons: quantile/quantile_disc
  * (discrete-quantile return-the-element semantics have no direct
  * Spark scalar-arg builder; covered behaviorally by f24),
  * mad/entropy/histogram (multi-pass or map-valued aggregates —
  * covered by f31/f28/f32's rewrites), struct_pack/struct_insert
  * (DuckDB's `k := v` named-argument syntax does not parse in
  * Spark), enum_&#42;/union_&#42;/bit-type functions (no ENUM/UNION/BIT
  * column types; the tagged-union and bitstring entries document the
  * struct/long encodings), and system introspection
  * (current_setting, stats, vector_type, …) which has no meaning off
  * the reference's runtime.
  */
object RefAliases {

  private def uf(name: String, args: Seq[Expression]): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def info(name: String) =
    new ExpressionInfo(classOf[UnresolvedFunction].getCanonicalName, name)

  private def register(e: SparkSessionExtensions, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name), builder))

  /** Plain rename: reference name → Spark built-in, args unchanged. */
  private def rename(e: SparkSessionExtensions, from: String, to: String): Unit =
    register(e, from)(args => uf(to, args))

  private def constString(name: String, ex: Expression): String = {
    require(ex.foldable, s"$name expects a constant string argument")
    val v = ex.eval(null)
    require(v != null, s"$name: constant argument is null")
    v.toString
  }

  /** strftime %-codes → java.time pattern, literal runs quoted. */
  private[plans] def strfToJava(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = {
      if (lit.nonEmpty) { out.append('\'').append(lit.toString.replace("'", "''")).append('\''); lit.clear() }
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val (code, step) =
          if (fmt.charAt(i + 1) == '-' && i + 2 < fmt.length) (s"-${fmt.charAt(i + 2)}", 3)
          else (fmt.charAt(i + 1).toString, 2)
        val j = code match {
          case "Y" => "yyyy"; case "y" => "yy"
          case "m" => "MM"; case "-m" => "M"
          case "d" => "dd"; case "-d" => "d"
          case "H" => "HH"; case "-H" => "H"
          case "I" => "hh"; case "-I" => "h"
          case "M" => "mm"; case "-M" => "m"
          case "S" => "ss"; case "-S" => "s"
          case "f" => "SSSSSS"; case "g" => "SSS"
          case "p" => "a"; case "j" => "DDD"
          case "a" => "EEE"; case "A" => "EEEE"
          case "b" | "h" => "MMM"; case "B" => "MMMM"
          case "%" => null // literal percent
          case other => throw new IllegalArgumentException(
            s"strftime/strptime: unsupported format code %$other")
        }
        if (j == null) lit.append('%') else { flush(); out.append(j) }
        i += step
      } else { lit.append(fmt.charAt(i)); i += 1 }
    }
    flush()
    out.toString
  }

  def registerAll(e: SparkSessionExtensions): Unit = {
    // ---- strings / binary ----
    register(e, "sha256")(args => uf("sha2", args :+ Literal(256)))
    rename(e, "starts_with", "startswith")
    rename(e, "strpos", "instr")
    rename(e, "editdist3", "levenshtein")
    rename(e, "ord", "ascii")
    rename(e, "to_base64", "base64")
    rename(e, "from_base64", "unbase64")
    rename(e, "to_hex", "hex")
    rename(e, "from_hex", "unhex")
    // literal-delimiter split: Spark's split() takes a REGEX, the
    // reference's string_split takes a literal — quote it at bind time
    for (n <- Seq("string_split", "str_split", "string_to_array"))
      register(e, n)(args =>
        uf("split", Seq(args(0), Literal(Pattern.quote(constString(n, args(1)))))))
    for (n <- Seq("string_split_regex", "str_split_regex", "regexp_split_to_array"))
      register(e, n)(args => uf("split", args))
    register(e, "regexp_escape")(args =>
      uf("regexp_replace", Seq(args(0),
        Literal("([.^$*+?()\\[\\]{}|\\\\])"), Literal("\\\\$1"))))
    register(e, "parse_filename")(args =>
      uf("element_at", Seq(uf("split", Seq(args(0), Literal("[/\\\\]"))), Literal(-1))))
    register(e, "parse_dirpath")(args =>
      uf("regexp_replace", Seq(args(0), Literal("[/\\\\][^/\\\\]*$"), Literal(""))))

    // ---- date / time ----
    rename(e, "week", "weekofyear")
    rename(e, "today", "current_date")
    rename(e, "datetrunc", "date_trunc")
    rename(e, "gen_random_uuid", "uuid")
    rename(e, "transaction_timestamp", "now")
    rename(e, "get_current_timestamp", "now")
    rename(e, "epoch_us", "unix_micros")
    register(e, "epoch_ns")(args =>
      Multiply(uf("unix_micros", args), Literal(1000L)))
    register(e, "epoch")(args =>
      Divide(Cast(uf("unix_micros", args), DoubleType), Literal(1e6)))
    // seconds-and-below components on the Postgres EXTRACT convention
    // (whole seconds included); date_part('SECOND') is DECIMAL(8,6),
    // so the scaling is exact
    register(e, "microsecond")(args =>
      Cast(Multiply(uf("date_part", Literal("SECOND") +: args), Literal(BigDecimal(1000000))), LongType))
    register(e, "millisecond")(args =>
      Cast(Multiply(uf("date_part", Literal("SECOND") +: args), Literal(BigDecimal(1000))), LongType))
    register(e, "nanosecond")(args =>
      Cast(Multiply(uf("date_part", Literal("SECOND") +: args), Literal(BigDecimal(1000000000))), LongType))
    // interval constructors
    register(e, "to_years")(args => uf("make_ym_interval", Seq(args(0), Literal(0))))
    register(e, "to_decades")(args =>
      uf("make_ym_interval", Seq(Multiply(args(0), Literal(10)), Literal(0))))
    register(e, "to_centuries")(args =>
      uf("make_ym_interval", Seq(Multiply(args(0), Literal(100)), Literal(0))))
    register(e, "to_millennia")(args =>
      uf("make_ym_interval", Seq(Multiply(args(0), Literal(1000)), Literal(0))))
    register(e, "to_months")(args => uf("make_ym_interval", Seq(Literal(0), args(0))))
    register(e, "to_quarters")(args =>
      uf("make_ym_interval", Seq(Literal(0), Multiply(args(0), Literal(3)))))
    register(e, "to_weeks")(args =>
      uf("make_dt_interval", Seq(Multiply(args(0), Literal(7)))))
    register(e, "to_days")(args => uf("make_dt_interval", args))
    register(e, "to_hours")(args => uf("make_dt_interval", Literal(0) +: args))
    register(e, "to_minutes")(args =>
      uf("make_dt_interval", Seq(Literal(0), Literal(0)) ++ args))
    register(e, "to_seconds")(args =>
      uf("make_dt_interval", Seq(Literal(0), Literal(0), Literal(0)) ++ args))
    register(e, "to_milliseconds")(args =>
      uf("make_dt_interval", Seq(Literal(0), Literal(0), Literal(0),
        Divide(Cast(args(0), DoubleType), Literal(1e3)))))
    register(e, "to_microseconds")(args =>
      uf("make_dt_interval", Seq(Literal(0), Literal(0), Literal(0),
        Divide(Cast(args(0), DoubleType), Literal(1e6)))))
    for (n <- Seq("strftime"))
      register(e, n)(args =>
        uf("date_format", Seq(args(0), Literal(strfToJava(constString(n, args(1)))))))
    register(e, "strptime")(args =>
      uf("to_timestamp", Seq(args(0), Literal(strfToJava(constString("strptime", args(1)))))))
    register(e, "try_strptime")(args =>
      uf("try_to_timestamp", Seq(args(0), Literal(strfToJava(constString("try_strptime", args(1)))))))

    // ---- numbers ----
    register(e, "xor")(args => BitwiseXor(args(0), args(1)))
    rename(e, "generate_series", "sequence")

    // ---- lists ----
    // HOF aliases build the concrete expression classes: a lambda
    // argument must see a higher-order PARENT during analysis, so a
    // rename via UnresolvedFunction would fail the analyzer's
    // NON_HIGHER_ORDER_FUNCTION check before resolving
    for (n <- Seq("list_transform", "list_apply", "array_transform", "array_apply", "apply"))
      register(e, n)(args => ArrayTransform(args(0), args(1)))
    for (n <- Seq("list_filter", "array_filter"))
      register(e, n)(args => ArrayFilter(args(0), args(1)))
    // the reference's reduce has NO init value — the first element
    // seeds the fold and the lambda runs over elements 2..n
    for (n <- Seq("list_reduce", "array_reduce"))
      register(e, n) { args =>
        val ident = {
          val v = UnresolvedNamedLambdaVariable(Seq("acc"))
          LambdaFunction(v, Seq(v))
        }
        ArrayAggregate(
          Slice(args(0), Literal(2), Subtract(Size(args(0)), Literal(1))),
          ElementAt(args(0), Literal(1)), args(1), ident)
      }
    for (n <- Seq("list_pack", "array_value")) rename(e, n, "array")
    // `list(x)` is the reference's AGGREGATE (alias of array_agg —
    // list_aggregates.cpp), NOT a constructor (that's list_value/
    // list_pack). Same NULL-dropping divergence as array_agg itself.
    rename(e, "list", "collect_list")
    rename(e, "row", "struct")
    for (n <- Seq("list_has_any", "array_has_any")) rename(e, n, "arrays_overlap")
    for (n <- Seq("list_has_all", "array_has_all"))
      register(e, n)(args =>
        EqualTo(Size(ArrayExcept(uf("array_compact", Seq(args(1))), args(0))), Literal(0)))
    for (n <- Seq("list_distinct"))
      register(e, n)(args => ArrayDistinct(uf("array_compact", args)))
    for (n <- Seq("array_unique"))
      register(e, n)(args =>
        Cast(Size(ArrayDistinct(uf("array_compact", args))), LongType))
    for (n <- Seq("list_reverse_sort", "array_reverse_sort"))
      register(e, n)(args => SortArray(args(0), Literal(false)))
    for (n <- Seq("list_grade_up", "array_grade_up", "grade_up"))
      register(e, n) { args =>
        // argsort: zip (value, 1-based index), lexicographic struct
        // sort (ties by original position), project the index
        val zipped = ZipWith(args(0),
          uf("sequence", Seq(Literal(1), Size(args(0)))),
          LambdaFunction(
            CreateNamedStruct(Seq(Literal("v"), UnresolvedNamedLambdaVariable(Seq("v")),
              Literal("i"), UnresolvedNamedLambdaVariable(Seq("i")))),
            Seq(UnresolvedNamedLambdaVariable(Seq("v")), UnresolvedNamedLambdaVariable(Seq("i")))))
        ArrayTransform(new ArraySort(zipped),
          LambdaFunction(
            UnresolvedExtractValue(UnresolvedNamedLambdaVariable(Seq("s")), Literal("i")),
            Seq(UnresolvedNamedLambdaVariable(Seq("s")))))
      }

    // ---- maps ----
    rename(e, "map_contains", "map_contains_key")
    // returns [value] / [] like the reference (not value / NULL);
    // the empty branch slices the same singleton so its element type
    // always matches
    register(e, "map_extract") { args =>
      val one = CreateArray(Seq(ElementAt(args(0), args(1))))
      If(uf("map_contains_key", args), one, Slice(one, Literal(1), Literal(0)))
    }

    // ---- aggregates ----
    // the reference's arg_max SKIPS rows whose argument is NULL
    // (arg_max_null keeps them); Spark's max_by keeps them but
    // ignores rows with a NULL ordering key — so null the key out
    // when the argument is null
    for ((n, t) <- Seq("arg_max" -> "max_by", "argmax" -> "max_by",
        "arg_min" -> "min_by", "argmin" -> "min_by"))
      register(e, n)(args =>
        uf(t, Seq(args(0), If(IsNull(args(0)), Literal(null), args(1)))))
    rename(e, "arg_max_null", "max_by")
    rename(e, "arg_min_null", "min_by")
    rename(e, "approx_quantile", "approx_percentile")
    rename(e, "quantile_cont", "percentile")
    rename(e, "kurtosis_pop", "kurtosis")
    register(e, "sem")(args =>
      Divide(uf("stddev_samp", args), uf("sqrt", Seq(uf("count", args)))))
    register(e, "favg")(args =>
      Divide(uf("kahan_sum", args), Cast(uf("count", args), DoubleType)))
    register(e, "group_concat") { args =>
      val sep = if (args.length >= 2) args(1) else Literal(",")
      uf("array_join", Seq(uf("collect_list", Seq(args(0))), sep))
    }
    register(e, "product")(args =>
      graft.operators.ProductAgg(Cast(args(0), DoubleType)).toAggregateExpression())

    // ---- vector / list arithmetic (the f45 sequential-fold
    // spelling: zip → multiply → left fold, bit-exact on both
    // engines because the fold order is the element order) ----
    def fold(arr: Expression): Expression = {
      val ident = { val v = UnresolvedNamedLambdaVariable(Seq("acc")); LambdaFunction(v, Seq(v)) }
      ArrayAggregate(arr, Literal(0.0),
        lambda2((a, b) => Add(a, Cast(b, DoubleType))), ident)
    }
    def zipMul(a: Expression, b: Expression): Expression =
      ZipWith(a, b, lambda2((x, y) => Multiply(Cast(x, DoubleType), Cast(y, DoubleType))))
    def dot(a: Expression, b: Expression): Expression = fold(zipMul(a, b))
    def norm(a: Expression): Expression = uf("sqrt", Seq(dot(a, a)))
    for (n <- Seq("list_dot_product", "list_inner_product",
        "array_dot_product", "array_inner_product"))
      register(e, n)(args => dot(args(0), args(1)))
    for (n <- Seq("list_negative_dot_product", "list_negative_inner_product",
        "array_negative_dot_product", "array_negative_inner_product"))
      register(e, n)(args => UnaryMinus(dot(args(0), args(1))))
    for (n <- Seq("list_cosine_similarity", "array_cosine_similarity"))
      register(e, n)(args =>
        Divide(dot(args(0), args(1)), Multiply(norm(args(0)), norm(args(1)))))
    for (n <- Seq("list_cosine_distance", "array_cosine_distance"))
      register(e, n)(args =>
        Subtract(Literal(1.0),
          Divide(dot(args(0), args(1)), Multiply(norm(args(0)), norm(args(1))))))
    for (n <- Seq("list_distance", "array_distance"))
      register(e, n) { args =>
        val diffSq = ZipWith(args(0), args(1), lambda2 { (x, y) =>
          val d = Subtract(Cast(x, DoubleType), Cast(y, DoubleType))
          Multiply(d, d)
        })
        uf("sqrt", Seq(fold(diffSq)))
      }
    register(e, "array_cross_product") { args =>
      def el(v: Expression, i: Int) = Cast(ElementAt(v, Literal(i)), DoubleType)
      val (a, b) = (args(0), args(1))
      CreateArray(Seq(
        Subtract(Multiply(el(a, 2), el(b, 3)), Multiply(el(a, 3), el(b, 2))),
        Subtract(Multiply(el(a, 3), el(b, 1)), Multiply(el(a, 1), el(b, 3))),
        Subtract(Multiply(el(a, 1), el(b, 2)), Multiply(el(a, 2), el(b, 1)))))
    }

    // ---- misc ----
    rename(e, "unpivot_list", "array")
    // byte length (ClickBench q28/q29 spell STRLEN)
    rename(e, "strlen", "octet_length")
    rename(e, "formatReadableSize", "format_bytes")
    register(e, "millennium")(args =>
      Cast(Add(Divide(Subtract(uf("year", args), Literal(1)), Literal(1000)),
        Literal(1)), IntegerType))
    // python-style '{}' / '{0}' / '{[N]:[width][.prec][dfsx]}'
    // placeholders (the reference vendors fmtlib) → java format_string
    register(e, "format") { args =>
      val fmt = constString("format", args(0))
      val out = new StringBuilder
      // per-argument conversion demanded by its format spec
      // ('s' string, 'f' double, 'd'/'x' long)
      val convOf = scala.collection.mutable.Map.empty[Int, Char]
      var auto = 0
      var i = 0
      val SpecRe = """(\d*)(?::(\d*)(\.\d+)?([dfsxX])?)?""".r
      while (i < fmt.length) {
        fmt.charAt(i) match {
          case '{' =>
            val close = fmt.indexOf('}', i)
            require(close >= i, "format: unbalanced '{'")
            val spec = fmt.substring(i + 1, close)
            spec match {
              case SpecRe(idxS, width, prec, conv) =>
                val idx = if (idxS.nonEmpty) idxS.toInt else { val a = auto; auto += 1; a }
                val c = Option(conv).map(_.head).getOrElse('s')
                convOf(idx) = c
                out.append("%").append(idx + 1).append("$")
                if (width != null && width.nonEmpty) out.append(width)
                if (prec != null) out.append(prec)
                out.append(c)
              case _ => throw new IllegalArgumentException(
                s"format: unsupported format spec '{$spec}'")
            }
            i = close + 1
          case '%' => out.append("%%"); i += 1
          case c => out.append(c); i += 1
        }
      }
      val casted = args.tail.zipWithIndex.map { case (a, ix) =>
        convOf.getOrElse(ix, 's') match {
          case 'f'       => Cast(a, DoubleType)
          case 'd' | 'x' | 'X' => Cast(a, LongType)
          case _         => Cast(a, StringType)
        }
      }
      uf("format_string", Literal(out.toString) +: casted)
    }
    // fixed-width tumbling buckets; sub-day widths only (the f23
    // alignment identity: the reference's 2000-01-03 origin lands on
    // the epoch grid for widths dividing 86400 s — enforced here)
    register(e, "time_bucket") { args =>
      require(args(0).foldable, "time_bucket expects a constant bucket width")
      // Spark parses INTERVAL '15 minutes' as an ANSI day-time
      // interval (Long micros); legacy CalendarInterval also accepted
      val w: Long = (args(0).dataType, args(0).eval(null)) match {
        case (_: DayTimeIntervalType, micros: java.lang.Long) => micros
        case (_, iv: org.apache.spark.unsafe.types.CalendarInterval) =>
          require(iv.months == 0 && iv.days == 0,
            "time_bucket alias supports sub-day widths only")
          iv.microseconds
        case (t, _) => throw new IllegalArgumentException(
          s"time_bucket alias supports sub-day interval widths only, got $t")
      }
      require(w > 0 && 86400000000L % w == 0,
        "time_bucket alias requires a width dividing 24h")
      val um = uf("unix_micros", Seq(args(1)))
      uf("timestamp_micros", Seq(Subtract(um, Pmod(um, Literal(w)))))
    }
  }

  private def lambda2(f: (Expression, Expression) => Expression): LambdaFunction = {
    val a = UnresolvedNamedLambdaVariable(Seq("a"))
    val b = UnresolvedNamedLambdaVariable(Seq("b"))
    LambdaFunction(f(a, b), Seq(a, b))
  }
}
