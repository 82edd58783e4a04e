package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The last tranche of reference core-function names: operator
  * spellings, named-argument constructors, and session introspection
  * (/root/reference/src/core_functions/&#42;&#42;/functions.json). Together
  * with the DuckDialect front door this closes the name surface —
  * the operator names are callable directly (Spark's parser accepts
  * backquoted routine names: \`**\`(2, 3)) and reachable through
  * their infix spellings via GraftSql.
  *
  * Deliberately NOT registered: `^` (Spark's registry already binds
  * it to XOR; overriding would silently change Spark-dialect
  * arithmetic, so the DuckDB meaning — power — is carried by the
  * dialect translation only), and enum_&#42; / setseed / stats /
  * vector_type / timetz_byte_comparable, which have no meaning off
  * the reference's runtime (no ENUM type, no per-query RNG state to
  * reseed, no vector executor) — documented N/A, no silent claim.
  *
  * Introspection semantics map to the Spark session: current_setting
  * reads SQLConf, current_schemas/in_search_path read the session
  * catalog's current namespace, current_query returns the text the
  * GraftSql front door recorded, txid_current is a session-monotonic
  * id (the engine's transactions are per-query; see sources/Dml).
  * All bind-time constant — zero runtime cost, like the reference's
  * bind-data constants.
  */
object DuckNames {

  private def info(name: String) =
    new ExpressionInfo(classOf[UnresolvedFunction].getCanonicalName, name)

  private def register(e: SparkSessionExtensions, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name), builder))

  private def uf(name: String, args: Seq[Expression]): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private val txid = new AtomicLong(1000L)

  private def constString(name: String, ex: Expression): String = {
    require(ex.foldable, s"$name expects a constant string argument")
    val v = ex.eval(null)
    require(v != null, s"$name: constant argument is null")
    v.toString
  }

  /** T-SQL period-crossing date_diff (reference
    * src/core_functions/scalar/date/date_diff.cpp:31–140): year =
    * year(end)−year(start); month = (12y+m−1) delta; quarter = that
    * div 3; decade/century/millennium = year div 10/100/1000 delta;
    * week = day-distance div 7 — "not Monday crossings, just
    * distance" (:93); day = epoch-day delta of the DATE part; sub-day
    * units = truncating epoch-micros division per value then
    * subtract (matches the C `/`, which truncates toward zero).
    * All arithmetic is on the session-naive clock, like the
    * reference's TIMESTAMP. Result is BIGINT.
    */
  def dateDiffExpr(unitRaw: String, start: Expression, end: Expression): Expression = {
    def asLong(x: Expression) = Cast(x, LongType)
    def dpart(x: Expression) = Cast(x, DateType)
    def idiv(x: Expression, d: Long) = IntegralDivide(asLong(x), Literal(d))
    def yr(x: Expression) = uf("year", Seq(dpart(x)))
    // zero-based month index: year*12 + month - 1
    def ymIdx(x: Expression) =
      Subtract(Add(Multiply(asLong(yr(x)), Literal(12L)), asLong(uf("month", Seq(dpart(x))))), Literal(1L))
    def um(x: Expression) = uf("unix_micros", Seq(Cast(x, TimestampType)))
    def delta(f: Expression => Expression) = Subtract(asLong(f(end)), asLong(f(start)))
    val days = DateDiff(dpart(end), dpart(start))
    val out: Expression = normUnit(unitRaw) match {
      case "year"        => delta(yr)
      case "isoyear"     => delta(x => uf("date_part", Seq(Literal("yearofweek"), dpart(x))))
      case "month"       => delta(ymIdx)
      case "quarter"     => delta(x => idiv(ymIdx(x), 3L))
      case "decade"      => delta(x => idiv(yr(x), 10L))
      case "century"     => delta(x => idiv(yr(x), 100L))
      case "millennium"  => delta(x => idiv(yr(x), 1000L))
      case "week"        => idiv(days, 7L)
      case "day"         => asLong(days)
      case "hour"        => delta(x => idiv(um(x), 3600000000L))
      case "minute"      => delta(x => idiv(um(x), 60000000L))
      case "second"      => delta(x => idiv(um(x), 1000000L))
      case "millisecond" => delta(x => idiv(um(x), 1000L))
      case "microsecond" => delta(um)
      case other => throw new IllegalArgumentException(
        s"date_diff: unrecognized unit '$other'")
    }
    Cast(out, LongType)
  }

  /** Reference unit-name aliases (common/enums/date_part_specifier). */
  private def normUnit(u0: String): String = u0.toLowerCase match {
    case "y" | "yr" | "yrs" | "year" | "years"                    => "year"
    case "isoyear"                                                => "isoyear"
    case "mon" | "mons" | "month" | "months"                      => "month"
    case "q" | "quarter" | "quarters"                             => "quarter"
    case "dec" | "decs" | "decade" | "decades"                    => "decade"
    case "c" | "cent" | "centuries" | "century"                   => "century"
    case "mil" | "mils" | "millenium" | "millennium" | "millennia" => "millennium"
    case "w" | "week" | "weeks" | "wk" | "wks" | "weekofyear"     => "week"
    case "d" | "day" | "days" | "dayofmonth"                      => "day"
    case "h" | "hr" | "hrs" | "hour" | "hours"                    => "hour"
    case "min" | "mins" | "minute" | "minutes"                    => "minute"
    case "s" | "sec" | "secs" | "second" | "seconds"              => "second"
    case "ms" | "msec" | "msecs" | "millisecond" | "milliseconds" => "millisecond"
    case "us" | "usec" | "usecs" | "microsecond" | "microseconds" => "microsecond"
    case other                                                    => other
  }

  def registerAll(e: SparkSessionExtensions): Unit = {
    // ---- operator spellings (fncheck closure + backquoted calls) ----
    register(e, "**")(args => uf("power", args))
    register(e, "//")(args => DuckDiv(args(0), args(1)))
    register(e, "@")(args => uf("abs", args))
    register(e, "!__postfix")(args => uf("factorial", args))
    register(e, "^@")(args => uf("starts_with", args))
    register(e, "<->")(args => uf("list_distance", args))
    register(e, "<=>")(args => uf("list_cosine_distance", args))
    register(e, "&&")(args => uf("list_has_any", args))
    register(e, "@>")(args => uf("list_has_all", args))
    register(e, "<@")(args => uf("list_has_all", args.reverse))

    // full-match regex (the reference's `~` operator; Spark RLIKE is
    // a partial match, so anchor with a non-capturing group)
    // finalize: kept for NAME closure only — the dialect front door
    // rewrites FINALIZE(state) structurally (r11 EXPORT_STATE struct
    // states, DuckDialect); a bare Spark-dialect call is the identity
    register(e, "finalize")(args => args.head)

    // sequence functions (nextval.cpp) — session registry in Sequences
    register(e, "nextval")(args => SequenceVal(args(0), isNext = true))
    register(e, "currval")(args => SequenceVal(args(0), isNext = false))

    register(e, "regexp_full_match") { args =>
      RLike(args(0), uf("concat", Seq(Literal("^(?:"), args(1), Literal(")$"))))
    }

    // duck_slice arities: 3 = legacy `(x, lo, hi)` with literal-NULL
    // bounds meaning "empty" (old spliced-view texts); 5 = explicit
    // empty flags; 6 = with a step argument (the `[a:b:c]` spelling)
    register(e, "duck_slice") { args =>
      def nullLit(x: Expression): Boolean = x match {
        case Literal(null, _) => true
        case _ => false
      }
      def boolLit(x: Expression): Boolean =
        x.eval(null).asInstanceOf[Boolean]
      args.length match {
        case 3 => DuckSlice(args(0), args(1), args(2), None,
          nullLit(args(1)), nullLit(args(2)))
        case 5 => DuckSlice(args(0), args(1), args(2), None,
          boolLit(args(3)), boolLit(args(4)))
        case 6 => DuckSlice(args(0), args(1), args(2), Some(args(3)),
          boolLit(args(4)), boolLit(args(5)))
        case other => throw new IllegalArgumentException(
          s"duck_slice: unsupported arity $other")
      }
    }
    for (n <- Seq("list_extract", "list_element", "array_extract"))
      register(e, n)(args => ListExtract(args(0), args(1)))

    // list-aggregate shorthands and regex names the dialect sweep
    // found in real reference query texts (semantics via the already
    // registered list_aggregate / RLike trees)
    register(e, "list_sum")(args => uf("list_aggregate", Seq(args.head, Literal("sum"))))
    register(e, "list_count")(args => uf("list_aggregate", Seq(args.head, Literal("count"))))
    register(e, "regexp_matches") { args =>
      // partial match (the reference's regexp_matches ≡ RLIKE); an
      // optional constant options arg maps the common 'i' flag
      val pat = if (args.length >= 3) {
        val opts = constString("regexp_matches", args(2))
        if (opts.contains("i")) uf("concat", Seq(Literal("(?i)"), args(1))) else args(1)
      } else args(1)
      RLike(args(0), pat)
    }
    register(e, "generate_subscripts") { args =>
      // generate_subscripts(list, 1): one row per 1-based index —
      // explode of the index sequence (empty list → no rows)
      uf("explode", Seq(uf("sequence", Seq(Literal(1), uf("size", Seq(args.head))))))
    }
    register(e, "json_merge_patch")(args => JsonMergePatch(args(0), args(1)))
    register(e, "json_keys")(args => uf("json_object_keys", args))
    // json_extract_string ≡ get_json_object ($-paths); row_to_json ≡
    // to_json over a struct; string/list renames the sweep surfaced
    register(e, "json_extract_string")(args => uf("get_json_object", args))
    register(e, "row_to_json")(args => uf("to_json", args))
    register(e, "ends_with")(args => uf("endswith", args))
    register(e, "list_reverse")(args => uf("reverse", args))
    // list_position: 1-based index, NULL when absent (Spark's
    // array_position spells absence as 0)
    for (n <- Seq("list_position", "list_indexof"))
      register(e, n)(args =>
        uf("nullif", Seq(uf("array_position", args), Literal(0L))))
    // 2-arg regexp_extract: the reference returns the FULL match
    // (group 0); Spark's default group is 1
    register(e, "regexp_extract") { args =>
      if (args.length == 2) RegExpExtract(args(0), args(1), Literal(0))
      else RegExpExtract(args(0), args(1), args(2))
    }
    register(e, "list_max")(args => uf("array_max", args))
    register(e, "list_min")(args => uf("array_min", args))
    register(e, "list_contains")(args => uf("array_contains", args))
    register(e, "list_zip")(args => uf("arrays_zip", args))
    // list_prepend(element, list) — the reference's argument order
    register(e, "list_prepend")(args =>
      uf("concat", Seq(uf("array", Seq(args(0))), args(1))))
    register(e, "list_append")(args =>
      uf("concat", Seq(args(0), uf("array", Seq(args(1))))))

    // Arity/default divergences from Spark built-ins (override is
    // safe: the Spark arities error today, so no behavior changes):
    // the reference's 2-arg regexp_extract_all extracts the FULL
    // match (group 0); Spark's defaults to group 1. 1-arg encode/
    // decode are UTF-8 string↔blob casts in the reference.
    register(e, "regexp_extract_all") { args =>
      if (args.length == 2) RegExpExtractAll(args(0), args(1), Literal(0))
      else RegExpExtractAll(args(0), args(1), args(2))
    }
    register(e, "encode") { args =>
      if (args.length == 1) Encode(args.head, Literal("UTF-8")) else Encode(args(0), args(1))
    }
    register(e, "decode") { args =>
      if (args.length == 1) new Decode(Seq(args.head, Literal("UTF-8"))) else new Decode(args)
    }
    // the reference's 3-arg date_diff('part', start, end) is T-SQL
    // period-CROSSING counting (date_diff.cpp:16 cites the T-SQL
    // doc), NOT elapsed complete units: date_diff('year',
    // DATE '2024-12-31', DATE '2025-01-01') = 1. Each unit counts
    // partition-boundary crossings — see dateDiffExpr. 2-arg
    // datediff keeps Spark's day-difference semantics.
    for (n <- Seq("date_diff", "datediff")) register(e, n) { args =>
      if (args.length == 3)
        dateDiffExpr(constString(n, args(0)), args(1), args(2))
      else DateDiff(args(0), args(1))
    }
    // Spark's parser intercepts date_diff/datediff with a quoted
    // unit before resolution, so the dialect rewrites that spelling
    // to this alias (DuckDialect call())
    register(e, "duck_date_diff") { args =>
      dateDiffExpr(constString("duck_date_diff", args(0)), args(1), args(2))
    }
    // 4th regexp_replace arg is an options STRING in the reference
    // ('g' = global, Spark's default; 'i' = case-insensitive) — not
    // Spark's numeric start position. Without 'g' the reference
    // replaces only the FIRST match (RE2::Replace vs GlobalReplace)
    // — honored via RegExpReplaceFirst. Documented divergence: the
    // 3-arg form KEEPS Spark's replace-all semantics (the reference
    // replaces only the first match without 'g') — flipping it would
    // silently change every existing DataFrame-API caller, the worse
    // trade; write 'g' explicitly for portable text.
    register(e, "regexp_replace") { args =>
      if (args.length == 4 && args(3).foldable &&
          args(3).dataType == StringType) {
        val opts = constString("regexp_replace", args(3))
        val pat = if (opts.contains("i"))
          UnresolvedFunction(Seq("concat"), Seq(Literal("(?i)"), args(1)), isDistinct = false)
        else args(1)
        if (opts.contains("g")) RegExpReplace(args(0), pat, args(2))
        else RegExpReplaceFirst(args(0), pat, args(2))
      } else if (args.length == 3) RegExpReplace(args(0), args(1), args(2))
      else RegExpReplace(args(0), args(1), args(2), args(3))
    }

    // DuckDB's len is polymorphic: characters for strings (same as
    // Spark's built-in, so existing queries are untouched), element
    // count for lists (BIGINT, like the reference). Registered over
    // the built-in to widen it — string results are bit-identical.
    register(e, "len")(args => LenPoly(args.head))
    // numeric→integer cast rounding parity (DuckDialect wraps integer
    // cast targets in these; see DuckRint). _try: unparsable strings
    // yield NULL (TRY_CAST); plain: they error (CAST, both engines)
    register(e, "graft_glob")(args => GlobMatch(args(0), args(1)))
    register(e, "graft_json_path")(args => JsonPathNorm(args.head))
    register(e, "graft_rint")(args => DuckRint(args.head))
    register(e, "graft_rint_try")(args => DuckRint(args.head, strict = false))

    // ---- named-argument constructors, positional form -------------
    // (the `k := v` spelling is rewritten to these by DuckDialect)
    register(e, "struct_pack")(args => CreateNamedStruct(args))
    register(e, "struct_insert") { args =>
      require(args.length >= 3 && (args.length - 1) % 2 == 0,
        "struct_insert expects (struct, 'name', value, ...)")
      args.drop(1).grouped(2).foldLeft(args.head) { case (acc, Seq(k, v)) =>
        UpdateFields(acc, constString("struct_insert", k), v)
      }
    }
    register(e, "union_value") { args =>
      require(args.length == 2, "union_value expects ('tag', value)")
      val tag = constString("union_value", args(0))
      CreateNamedStruct(Seq(
        Literal("tag"), Literal(tag), Literal(tag), args(1)))
    }

    // ---- session introspection ------------------------------------
    register(e, "current_setting") { args =>
      val key = constString("current_setting", args(0))
      Literal(SQLConf.get.getConfString(key, ""))
    }
    register(e, "current_query") { _ =>
      Literal(SQLConf.get.getConfString("spark.graft.current_query", ""))
    }
    register(e, "txid_current")(_ => Literal(txid.incrementAndGet()))
    register(e, "current_schemas") { args =>
      require(args.head.foldable, "current_schemas expects a constant boolean")
      val incl = args.head.eval(null) == true
      val db = SparkSession.active.catalog.currentDatabase
      val schemas = if (incl) Seq(db, "global_temp") else Seq(db)
      CreateArray(schemas.map(Literal(_)))
    }
    register(e, "in_search_path") { args =>
      val db = constString("in_search_path", args(0))
      val schema = constString("in_search_path", args(1))
      val cat = SparkSession.active
      val hit = db == cat.catalog.currentCatalog &&
        (schema == cat.catalog.currentDatabase || schema == "global_temp")
      Literal(hit)
    }
    register(e, "alias") { args =>
      args.head match {
        case a: UnresolvedAttribute => Literal(a.nameParts.last)
        case a: Attribute => Literal(a.name)
        case l: Literal => Literal(l.sql.stripPrefix("L")) // render value text
        case other => Literal(other.sql)
      }
    }
    register(e, "can_cast_implicitly")(args =>
      CanCastImplicitly(args(0), args(1)))
    register(e, "create_sort_key")(args => CreateSortKey(args))
    // no TIME type in Spark 4.1 (parses, unsupported in Cast):
    // render the reference's TIMETZ as its VARCHAR form, UTC offset
    register(e, "get_current_time") { _ =>
      uf("concat", Seq(
        uf("date_format", Seq(uf("now", Nil), Literal("HH:mm:ss.SSSSSS"))),
        Literal("+00")))
    }
  }
}

/** First-match-only regexp replacement — the reference's 4-arg
  * regexp_replace WITHOUT 'g' in the options string binds
  * RE2::Replace, which rewrites only the first occurrence
  * (extension/.. duckdb_re2; options parsed in
  * src/function/scalar/string/regexp.cpp). Backrefs in the
  * replacement use the reference's `\1` spelling and are converted
  * to Java's `$1`; a literal `$` is escaped.
  */
case class RegExpReplaceFirst(subject: Expression, regexp: Expression, rep: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  @transient private var lastPat: String = _
  @transient private var compiled: java.util.regex.Pattern = _
  private def toJavaReplacement(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length && r.charAt(i + 1).isDigit) {
        sb += '$'; sb += r.charAt(i + 1); i += 2
      } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1) == '\\') {
        sb ++= "\\\\"; i += 2
      } else if (c == '$') { sb ++= "\\$"; i += 1 }
      else if (c == '\\') { sb ++= "\\\\"; i += 1 }
      else { sb += c; i += 1 }
    }
    sb.toString
  }
  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val ps = p.toString
    if (compiled == null || lastPat != ps) {
      compiled = java.util.regex.Pattern.compile(ps)
      lastPat = ps
    }
    UTF8String.fromString(
      compiled.matcher(s.toString).replaceFirst(toJavaReplacement(r.toString)))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RegExpReplaceFirst =
    copy(subject = f, regexp = s, rep = t)
}

/** The reference's `//` operator (src/core_functions/scalar/math):
  * truncating division on integral inputs (7//2 = 3, -7//2 = -3),
  * plain division otherwise (7.5//2 = 3.75). Type dispatch happens at
  * analysis via `dataType`, so each occurrence evaluates one branch.
  */
case class DuckDiv(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def numeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (numeric(left.dataType) && numeric(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"`//` expects numeric operands, got ${left.dataType.sql} and ${right.dataType.sql}")
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private lazy val bothIntegral = integral(left.dataType) && integral(right.dataType)
  override def dataType: DataType = if (bothIntegral) LongType else DoubleType
  private def toDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue
  }
  private def toLong(v: Any): Long = v match {
    case d: Decimal => d.toLong
    case n: Number => n.longValue
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    if (bothIntegral) {
      val d = toLong(r)
      if (d == 0L) null else toLong(l) / d
    } else {
      // the reference binds `//` through BinaryZeroIsNullWrapper
      // (ieee_floating_point_ops off by default): zero divisor →
      // NULL on the float branch too, matching the integral branch
      val d = toDouble(r)
      if (d == 0.0) null else toDouble(l) / d
    }
  override def nullable: Boolean = true
  // codegen'd on the common primitive branches (static at codegen
  // time); decimal operands use the interpreted fallback
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val decimalIn = Seq(left.dataType, right.dataType).exists(_.isInstanceOf[DecimalType])
    if (decimalIn) super.doGenCode(ctx, ev)
    else if (bothIntegral) nullSafeCodeGen(ctx, ev, (l, r) => s"""
        |if ((long)($r) == 0L) { ${ev.isNull} = true; }
        |else { ${ev.value} = (long)($l) / (long)($r); }
      """.stripMargin)
    else nullSafeCodeGen(ctx, ev, (l, r) => s"""
        |if (((double)($r)) == 0.0) { ${ev.isNull} = true; }
        |else { ${ev.value} = ((double)($l)) / ((double)($r)); }
      """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DuckDiv =
    copy(left = l, right = r)
}

/** nextval('seq') / currval('seq') (reference nextval.cpp): reads
  * and advances the session sequence registry (plans/Sequences).
  * Nondeterministic so the optimizer never folds, caches, or
  * reorders calls — one advance per input row, like the reference.
  */
case class SequenceVal(nameExpr: Expression, isNext: Boolean)
    extends UnaryExpression with Nondeterministic with CodegenFallback {
  override def child: Expression = nameExpr
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = nameExpr.eval(input)
    if (n == null) null
    else if (isNext) Sequences.next(n.toString)
    else Sequences.curr(n.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): SequenceVal =
    copy(nameExpr = newChild)
}

/** The reference's slice `x[lo:hi[:step]]` over lists AND strings
  * (src/core_functions/scalar/list/array_slice.cpp — ClampSlice +
  * CalculateSliceLength, pinned by test/sql/types/nested/list/
  * test_list_slice_step.test and …_negative_step.test): 1-based
  * inclusive bounds, negative bounds count from the end, SYNTACTIC
  * empties (`x[:3]`, `x[1:-:2]` — loEmpty/hiEmpty flags) default to
  * the ends while a NULL bound VALUE yields NULL, negative step
  * reverses (begin/end swap, with the empty flags swapping roles),
  * step 0 raises, out-of-range clamps, lo &gt; hi yields empty.
  * Type-polymorphic, so it backs the dialect's `[a:b:c]` spelling
  * where the operand type is unknown at translate time; also backs
  * list_slice / array_slice (3- and 4-arg forms).
  */
case class DuckSlice(input: Expression, lo: Expression, hi: Expression,
    stepOpt: Option[Expression], loEmpty: Boolean, hiEmpty: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(input, lo, hi) ++ stepOpt
  override def dataType: DataType = input.dataType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    input.dataType match {
      case _: ArrayType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType if stepOpt.isEmpty =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        // the reference errors on stepped string slices (array_slice.cpp
        // has no string step kernel; test_list_slice_step.test pins it)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "duck_slice: slice steps are not supported on strings")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"duck_slice expects a list or string input, got ${other.sql}")
    }

  private def asLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue
    case d: Decimal => d.toLong
    case s: UTF8String => s.toString.trim.toLong
    case other => other.asInstanceOf[java.lang.Number].longValue
  }

  override def eval(row: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val in = input.eval(row)
    if (in == null) return null
    val n: Long = in match {
      case s: UTF8String => s.numChars().toLong
      case arr: ArrayData => arr.numElements().toLong
    }
    var begin: Long = if (loEmpty) 0L else {
      val v = lo.eval(row); if (v == null) return null; asLong(v)
    }
    var end: Long = if (hiEmpty) n else {
      val v = hi.eval(row); if (v == null) return null; asLong(v)
    }
    val step: Long = stepOpt match {
      case Some(se) =>
        val v = se.eval(row); if (v == null) return null; asLong(v)
      case None => 1L
    }
    if (step < 0) { // reverse: swap bounds; the empty flags swap roles
      val t = begin; begin = end; end = t
      if (hiEmpty) begin = 0L
      if (loEmpty) end = n
    }
    // ClampSlice: shift 1-based inclusive → 0-based exclusive-end
    if (begin != 0L && begin != Long.MinValue) begin -= 1
    val isMin = begin == Long.MinValue
    if (isMin) begin += 1
    if (begin < 0 && -begin > n && end < 0 && end < -n) { begin = 0; end = 0 }
    else {
      if (begin < 0 && -begin > n) begin = 0
      if (begin < 0) { if (!isMin) begin += 1; begin += n }
      else if (begin > n) begin = n
      if (end < 0) end = end + 1 + n
      else if (end > n) end = n
      end = math.max(begin, end)
    }
    in match {
      case s: UTF8String =>
        if (end <= begin) UTF8String.EMPTY_UTF8
        else s.substringSQL(begin.toInt + 1, (end - begin).toInt)
      case arr: ArrayData =>
        val et = input.dataType.asInstanceOf[ArrayType].elementType
        val span = end - begin
        if (span <= 0) new GenericArrayData(Array.empty[Any])
        else if (step == 1)
          new GenericArrayData(
            (begin until end).map(i => arr.get(i.toInt, et)).toArray)
        else {
          if (step == 0)
            throw new IllegalArgumentException("Slice step cannot be zero")
          val st = math.abs(step)
          val len =
            if (st >= span) 1L
            else if (span % st != 0) span / st + 1
            else span / st
          var idx = if (step > 0) begin else end - 1
          val out = new Array[Any](len.toInt)
          var i = 0
          while (i < len) { out(i) = arr.get(idx.toInt, et); idx += step; i += 1 }
          new GenericArrayData(out)
        }
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSlice =
    copy(input = newChildren(0), lo = newChildren(1), hi = newChildren(2),
      stepOpt = if (newChildren.length > 3) Some(newChildren(3)) else None)
}

/** The reference's 1-based subscript `x[i]` / list_extract
  * (src/function/scalar/list/list_extract.cpp) over lists and
  * strings: negative indexes count from the end (-1 = last), index 0
  * and out-of-range yield NULL — unlike Spark's element_at, which
  * raises on index 0. Backs the dialect's `x[i]` spelling.
  */
case class ListExtract(input: Expression, index: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = input
  override def right: Expression = index
  private def constIdx: Int = {
    require(index.foldable, "struct subscripts require a constant index")
    index.eval(null).asInstanceOf[Number].intValue
  }
  /** struct['name'] — 1-based position of a constant string key. */
  private def structFieldIdx(s: StructType): Int = index.dataType match {
    case StringType if index.foldable =>
      val name = index.eval(null).toString
      val i = s.fields.indexWhere(_.name.equalsIgnoreCase(name))
      require(i >= 0, s"struct subscript: no field '$name'")
      i + 1
    case _ => constIdx
  }
  override def dataType: DataType = input.dataType match {
    case ArrayType(et, _) => et
    case s: StructType => s.fields(structFieldIdx(s) - 1).dataType // 1-based, like the reference
    // map subscript returns a LIST — [value] on hit, [] on miss
    // (reference map_extract.cpp:30 binds LIST(value_type), :88
    // returns the empty list for a missing key)
    case MapType(_, vt, _) => ArrayType(vt)
    case _ => StringType
  }
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    input.dataType match {
      case _: ArrayType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case s: StructType =>
        if (index.foldable && { val i = structFieldIdx(s); i >= 1 && i <= s.fields.length })
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "struct subscript must be a constant position or field name")
      case m: MapType =>
        if (index.dataType == m.keyType ||
            index.dataType.catalogString == m.keyType.catalogString)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"map subscript key must be ${m.keyType.sql}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"list_extract expects a list, string, struct, or map input, got ${other.sql}")
    }
  override def nullSafeEval(in: Any, idxV: Any): Any = input.dataType match {
    case StringType =>
      val s = in.asInstanceOf[UTF8String]
      val i0 = idxV.asInstanceOf[Number].intValue
      val n = s.numChars()
      val i = if (i0 < 0) n + i0 + 1 else i0
      if (i < 1 || i > n) null else s.substringSQL(i, 1)
    case at: ArrayType =>
      val arr = in.asInstanceOf[ArrayData]
      val i0 = idxV.asInstanceOf[Number].intValue
      val n = arr.numElements()
      val i = if (i0 < 0) n + i0 + 1 else i0
      if (i < 1 || i > n) null else arr.get(i - 1, at.elementType)
    case st: StructType =>
      val row = in.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val i = structFieldIdx(st)
      if (row.isNullAt(i - 1)) null else row.get(i - 1, st.fields(i - 1).dataType)
    case mt: MapType =>
      val m = in.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray()
      val n = m.numElements()
      var i = 0
      var hit = -1
      while (i < n && hit < 0) {
        if (keys.get(i, mt.keyType) == idxV) hit = i
        i += 1
      }
      if (hit < 0) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](
        if (m.valueArray().isNullAt(hit)) null
        else m.valueArray().get(hit, mt.valueType)))
    case _ => null
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ListExtract =
    copy(input = l, index = r)
}

/** DuckDB's polymorphic len (string → characters, like Spark's
  * built-in length; list → element count as BIGINT, like the
  * reference; binary → bytes). Registered over the string-only
  * built-in so dialect queries like len(list_filter(...)) resolve.
  */
/** The reference's numeric→integer CAST rounds; Spark's truncates.
  * This expression applies the reference's per-type rounding rule so
  * `CAST(graft_rint(x) AS INT)` (what the dialect emits for integer
  * cast targets) matches DuckDB bit-for-bit:
  *   DOUBLE/FLOAT → round half to EVEN (std::nearbyint,
  *     cast_operators double→integral: 49.5→50, 48.5→48);
  *   DECIMAL → round half AWAY from zero (decimal_cast 49.5→50,
  *     48.5→49, −49.5→−50);
  *   VARCHAR → parse as double, half away ('48.5'→49);
  *   integral and everything else → identity (the outer cast already
  *     agrees).
  * Output type: input type for numerics (value rounded to an
  * integral), DECIMAL(38,0) for strings — exact over the whole
  * int64/int128 range (a Double detour silently corrupts digit
  * strings past 2^53, e.g. '9223372036854775807'::BIGINT), and the
  * outer integer CAST then truncates an already-rounded value.
  * Codegen'd: this sits inside arbitrary cast chains and must not
  * break whole-stage spans.
  */
case class DuckRint(input: Expression, strict: Boolean = true) extends UnaryExpression {
  override def child: Expression = input
  override def dataType: DataType = input.dataType match {
    case StringType => DecimalType(38, 0)
    case other => other
  }
  override def nullSafeEval(in: Any): Any = input.dataType match {
    case DoubleType => Math.rint(in.asInstanceOf[Double])
    case FloatType => Math.rint(in.asInstanceOf[Float].toDouble).toFloat
    case d: DecimalType =>
      // HALF_UP on java BigDecimal = half away from zero (both signs)
      val bd = in.asInstanceOf[Decimal].toJavaBigDecimal
        .setScale(0, java.math.RoundingMode.HALF_UP).setScale(d.scale)
      Decimal(bd, d.precision, d.scale)
    case StringType =>
      val s = in.asInstanceOf[UTF8String].toString.trim
      try {
        // exact arbitrary-precision parse + half away from zero, like
        // the reference's string→int path (integer_cast_operator.hpp
        // parses digits exactly; only the fraction rounds)
        val bd = new java.math.BigDecimal(s)
          .setScale(0, java.math.RoundingMode.HALF_UP)
        if (bd.precision > 38) throw new NumberFormatException(
          s"Cast: value out of range for integer: '$s'")
        Decimal(bd, 38, 0)
      } catch {
        case e: NumberFormatException =>
          // plain CAST errors in BOTH engines; TRY_CAST yields NULL
          if (strict) throw new NumberFormatException(
            s"Cast: invalid input syntax for integer: '$s'")
          else null
      }
    case _ => in
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    input.dataType match {
      case DoubleType => defineCodeGen(ctx, ev, c => s"java.lang.Math.rint($c)")
      case FloatType =>
        defineCodeGen(ctx, ev, c => s"(float) java.lang.Math.rint((double) $c)")
      case _: DecimalType | StringType =>
        val self = ctx.addReferenceObj("duckRint", this, classOf[DuckRint].getName)
        nullSafeCodeGen(ctx, ev, c => {
          val out =
            if (dataType == DoubleType) "((java.lang.Double) __r).doubleValue()"
            else s"(${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dataType)}) __r"
          s"""Object __r = $self.nullSafeEval($c);
             |if (__r == null) { ${ev.isNull} = true; } else {
             |  ${ev.value} = $out;
             |}""".stripMargin
        })
      case _ => defineCodeGen(ctx, ev, c => c) // integral & friends: identity
    }
  override protected def withNewChildInternal(c: Expression): DuckRint = copy(input = c)
}

/** `s GLOB pattern` with a NON-LITERAL pattern — the reference
  * evaluates glob per row (like.cpp); literal patterns compile to an
  * anchored RLIKE at translate time instead (DuckDialect.globRegex —
  * same semantics, including malformed-pattern = no-match). Codegen'd
  * static call into HashKernels.globMatch.
  */
case class GlobMatch(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(s: Any, p: Any): Any =
    HashKernels.globMatch(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (s, p) => s"graft.plans.HashKernels.globMatch($s, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GlobMatch =
    copy(left = l, right = r)
}

/** Normalize a RUNTIME JSON path operand to Spark's JSONPath syntax —
  * the same rules the dialect applies to literal `->` operands
  * (DuckDialect.jsonPath): '$…'-prefixed paths pass through with
  * `."quoted"` segments re-quoted as ['…']; a bare integer is an
  * array index; anything else is one object key (bracket-quoted so
  * spaces survive). NULL path → NULL (reference parity).
  */
case class JsonPathNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(in: Any): Any =
    JsonPathNorm.norm(String.valueOf(in)) // string paths AND int indices
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JsonPathNorm.norm(String.valueOf($c))")
  override protected def withNewChildInternal(c: Expression): JsonPathNorm =
    copy(child = c)
}

object JsonPathNorm {
  def norm(s: String): UTF8String = {
    val out =
      if (s.startsWith("$")) {
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '.' && i + 1 < s.length && s.charAt(i + 1) == '"') {
            var j = i + 2
            val k = new StringBuilder
            while (j < s.length && s.charAt(j) != '"') { k += s.charAt(j); j += 1 }
            sb ++= "['"; sb ++= k; sb ++= "']"
            i = j + 1
          } else { sb += c; i += 1 }
        }
        sb.toString
      }
      else if (s.matches("-?\\d+")) s"$$[$s]"
      else "$['" + s + "']"
    UTF8String.fromString(out)
  }
}

case class LenPoly(input: Expression) extends UnaryExpression {
  override def child: Expression = input
  override def dataType: DataType = input.dataType match {
    case _: ArrayType => LongType
    case _ => IntegerType
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    input.dataType match {
      case _: ArrayType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"len expects a string, binary, or list input, got ${other.sql}")
    }
  override def nullSafeEval(in: Any): Any = in match {
    case s: UTF8String => s.numChars()
    case b: Array[Byte] => b.length
    case arr: ArrayData => arr.numElements().toLong
  }
  // codegen'd: len overrides a Spark built-in, so it must not break a
  // whole-stage span (the type dispatch is static at codegen time)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    input.dataType match {
      case StringType => defineCodeGen(ctx, ev, c => s"($c).numChars()")
      case BinaryType => defineCodeGen(ctx, ev, c => s"($c).length")
      case _ => defineCodeGen(ctx, ev, c => s"(long)(($c).numElements())")
    }
  override protected def withNewChildInternal(c: Expression): LenPoly = copy(input = c)
}

/** RFC 7386 JSON merge patch (the reference's bundled json extension
  * json_merge_patch): a non-object patch replaces the target
  * wholesale; object patches merge recursively, null members remove
  * keys. A NULL argument yields the other (the reference's
  * two-argument behavior). Uses Spark's vendored Jackson; key order
  * is target-then-new, matching compact insertion-ordered output.
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def merge(
      target: com.fasterxml.jackson.databind.JsonNode,
      patch: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (!patch.isObject) return patch
    val base: ObjectNode =
      if (target.isObject) target.deepCopy[ObjectNode]()
      else mapper.createObjectNode()
    val it = patch.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) base.remove(e.getKey)
      else if (base.has(e.getKey)) base.set[ObjectNode](e.getKey, merge(base.get(e.getKey), e.getValue))
      else base.set[ObjectNode](e.getKey, e.getValue)
    }
    base
  }

  override def eval(row: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(row)
    val r = right.eval(row)
    if (l == null && r == null) return null
    if (l == null) return r
    if (r == null) return l
    val merged = merge(
      mapper.readTree(l.asInstanceOf[UTF8String].toString),
      mapper.readTree(r.asInstanceOf[UTF8String].toString))
    UTF8String.fromString(mapper.writeValueAsString(merged))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonMergePatch =
    copy(left = l, right = r)
}

/** can_cast_implicitly(a, b): whether a's type implicitly casts to
  * b's (reference src/function/scalar/generic/can_implicitly_cast
  * .cpp). Mapped onto Spark's loss-less implicit-cast lattice
  * (Cast.canUpCast) — a bind-time constant, like the reference's.
  */
case class CanCastImplicitly(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(row: org.apache.spark.sql.catalyst.InternalRow): Any =
    Cast.canUpCast(left.dataType, right.dataType)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CanCastImplicitly =
    copy(left = l, right = r)
}
