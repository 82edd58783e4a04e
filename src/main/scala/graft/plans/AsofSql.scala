package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DmlSql.{topIndexOf, topSplit}

/** `ASOF [LEFT] JOIN` statement syntax through the front door — the
  * reference's spelling (parser/transform/tableref/transform_join.cpp:54
  * sets JoinRefType::ASOF; the binder requires exactly one inequality
  * among the conjuncts). The join itself is the q31 union+window plan
  * (operators/Joins.asofJoin): one shuffle on the key, one sort, zero
  * pair space — the same partition-by-key/sort-by-time shape as the
  * reference's physical_asof_join.cpp, which is the plan that holds
  * at 100 TB.
  *
  * Translate-time rewrite, schema-aware: the joined result is
  * registered as a temp view and the statement re-targeted at it, so
  * everything around the join (projections, WHERE, GROUP BY, the rest
  * of the dialect) flows through the normal path. Supported shape:
  * `FROM <table> [alias] ASOF [LEFT] JOIN <table> [alias] ON <conds>`
  * with plain table names; equality conjuncts become the key, the one
  * inequality (>=, >, <=, <) the time ordering. Right-side columns
  * whose names collide with left ones are dropped from the output
  * (for matched rows the key columns are equal anyway) — qualify with
  * distinct names where both are needed.
  */
object AsofSql {

  private val viewId = new AtomicLong(0L)

  private val ClauseKw = Set("WHERE", "GROUP", "HAVING", "WINDOW", "QUALIFY",
    "ORDER", "LIMIT", "UNION", "EXCEPT", "INTERSECT", "USING")

  /** True when the statement contains a top-level `ASOF
    * [LEFT|RIGHT|SEMI] JOIN` — or is a WITH statement whose CTE
    * bodies contain one (the rewrite materializes CTE bodies through
    * the front door, which routes their nested ASOF recursively). */
  def matches(text: String): Boolean =
    topIndexOf(text, "ASOF JOIN") >= 0 ||
      topIndexOf(text, "ASOF LEFT JOIN") >= 0 ||
      topIndexOf(text, "ASOF RIGHT JOIN") >= 0 ||
      topIndexOf(text, "ASOF SEMI JOIN") >= 0 ||
      topIndexOf(text, "ASOF ANTI JOIN") >= 0 ||
      (text.trim.toUpperCase.startsWith("WITH") && cteBodyAsof(text))

  private def cteBodyAsof(text: String): Boolean =
    try {
      var i = text.toUpperCase.indexOf("WITH") + 4
      var found = false
      var more = true
      while (more && !found) {
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        val nameEnd = text.indexWhere(c => !(c.isLetterOrDigit || c == '_'), i)
        if (nameEnd <= i) return false
        i = nameEnd
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        if (!text.regionMatches(true, i, "AS", 0, 2)) return false
        i += 2
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        if (i >= text.length || text.charAt(i) != '(') return false
        val close = SqlPasses.matchParen(text, i)
        if (matches(text.substring(i + 1, close))) found = true
        i = close + 1
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        if (i < text.length && text.charAt(i) == ',') i += 1 else more = false
      }
      found
    } catch { case _: Exception => false }

  /** Execute the join and return the statement rewritten over the
    * registered view. A leading WITH clause is materialized first —
    * each CTE becomes a temp view (the reference binds CTEs before
    * the join ref the same way), so `ASOF JOIN <cte>` works.
    */
  def rewrite(spark: SparkSession, text0: String): String = {
    var text = text0
    if (text.trim.toUpperCase.startsWith("WITH")) {
      var i = text.indexOf(text.trim.take(4)) + 4
      var more = true
      while (more) {
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        val nameEnd = text.indexWhere(c => !(c.isLetterOrDigit || c == '_'), i)
        val name = text.substring(i, nameEnd)
        i = nameEnd
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        require(text.regionMatches(true, i, "AS", 0, 2), "WITH: expected AS")
        i += 2
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        require(text.charAt(i) == '(', "WITH: expected (query)")
        val close = SqlPasses.matchParen(text, i)
        graft.GraftSql.sql(spark, text.substring(i + 1, close))
          .createOrReplaceTempView(name)
        i = close + 1
        while (i < text.length && text.charAt(i).isWhitespace) i += 1
        if (i < text.length && text.charAt(i) == ',') i += 1 else more = false
      }
      text = text.substring(i)
    }
    val asofIdx = topIndexOf(text, "ASOF")
    // WITH statement whose ASOF lived entirely inside the (already
    // materialized) CTE bodies: nothing left to rewrite here
    if (asofIdx < 0) return text
    val fromIdx = topIndexOf(text, "FROM")
    require(fromIdx >= 0, "ASOF JOIN: no FROM clause")
    require(asofIdx > fromIdx, "ASOF JOIN: ASOF before FROM")
    val (ltName, ltAlias) = tableRef(spark, text.substring(fromIdx + 4, asofIdx))
    var rest = text.substring(asofIdx + 4).trim
    var leftOuter = false
    var rightOuter = false
    var semi = false
    var anti = false
    if (rest.toUpperCase.startsWith("LEFT")) { leftOuter = true; rest = rest.drop(4).trim }
    else if (rest.toUpperCase.startsWith("RIGHT")) { rightOuter = true; rest = rest.drop(5).trim }
    else if (rest.toUpperCase.startsWith("SEMI")) { semi = true; rest = rest.drop(4).trim }
    else if (rest.toUpperCase.startsWith("ANTI")) { anti = true; rest = rest.drop(4).trim }
    require(rest.toUpperCase.startsWith("JOIN"), "ASOF: expected JOIN")
    rest = rest.drop(4).trim
    val onIdx = topIndexOf(rest, "ON")
    require(onIdx > 0, "ASOF JOIN: missing ON")
    val (rtName, rtAlias) = tableRef(spark, rest.substring(0, onIdx))
    rest = rest.substring(onIdx + 2)
    // the ON condition runs to the next top-level clause keyword
    val condEnd = ClauseKw.iterator.map(k => topIndexOf(rest, k))
      .filter(_ >= 0).reduceOption(_ min _).getOrElse(rest.length)
    val cond = rest.substring(0, condEnd)
    val tail = rest.substring(condEnd)

    val lt = spark.table(ltName)
    val rt0 = spark.table(rtName)
    val lNames = (Seq(ltName) ++ ltAlias).map(_.toLowerCase)
    val rNames = (Seq(rtName) ++ rtAlias).map(_.toLowerCase)
    // name-colliding right columns: rename them (c → c__r) and
    // rewrite the statement's QUALIFIED references so `t2.col0`
    // survives when both sides spell the same column name — without
    // this the collision rule silently dropped the right column and
    // `t2.col0` resolved to the LEFT side
    val collide = rt0.columns.filter(c => lt.columns.exists(_.equalsIgnoreCase(c)))
    val rt =
      if (collide.isEmpty) rt0
      else rt0.toDF(rt0.columns.map(c =>
        if (collide.contains(c)) s"${c}__r" else c).toIndexedSeq: _*)
    def renameRefs(s: String): String = {
      var out = s
      for (q <- rNames; c <- collide)
        out = out.replaceAll(
          "(?i)\\b" + java.util.regex.Pattern.quote(q) + "\\s*\\.\\s*" +
            java.util.regex.Pattern.quote(c) + "\\b",
          s"${c}__r")
      out
    }
    val textHead = renameRefs(text.substring(0, fromIdx))
    def strip(e: String): String = {
      var s = e
      for (q <- lNames ++ rNames)
        s = s.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(q) + "\\s*\\.\\s*", "")
      s
    }
    def sideOf(e: String): String = {
      val qual = "(?i)\\b([A-Za-z_][A-Za-z_0-9]*)\\s*\\.".r
        .findFirstMatchIn(e).map(_.group(1).toLowerCase)
      qual match {
        case Some(q) if lNames.contains(q) => "l"
        case Some(q) if rNames.contains(q) => "r"
        case _ =>
          // scan every identifier in the expression (function names
          // and type keywords like CAST/TIMESTAMP resolve to neither
          // side) and take the first that names a column
          val ids = "(?i)\\b[A-Za-z_][A-Za-z_0-9]*\\b".r.findAllIn(e.trim)
          ids.collectFirst {
            case c if lt.columns.exists(_.equalsIgnoreCase(c)) => "l"
            case c if rt.columns.exists(_.equalsIgnoreCase(c)) => "r"
          }.getOrElse(throw new IllegalArgumentException(
            s"ASOF JOIN: cannot resolve side of `$e`"))
      }
    }

    val leftKeys = scala.collection.mutable.ArrayBuffer.empty[Column]
    val rightKeys = scala.collection.mutable.ArrayBuffer.empty[Column]
    var time: Option[(Column, Column, String)] = None
    val condR = renameRefs(cond)
    val tailR = renameRefs(tail)
    for (conjunct <- splitAnd(condR)) {
      val (lhs, op, rhs) = comparison(conjunct)
      val (le, re0, normOp) =
        if (sideOf(lhs) == "l") (lhs, rhs, op)
        else (rhs, lhs, flip(op))
      require(sideOf(re0) == "r",
        s"ASOF JOIN: conjunct `$conjunct` does not compare the two sides")
      if (normOp == "=") {
        leftKeys += expr(strip(le)); rightKeys += expr(strip(re0))
      } else {
        require(time.isEmpty, s"ASOF JOIN: more than one inequality in `$condR`")
        time = Some((expr(strip(le)), expr(strip(re0)), normOp))
      }
    }
    val (ltime, rtime, dir) = time.getOrElse(throw new IllegalArgumentException(
      "ASOF JOIN: no inequality condition (reference requires exactly one)"))

    // positional field names: the union inside asofJoin matches
    // nested struct fields BY NAME, and the two sides' key
    // expressions are named differently
    def keyStruct(ks: Seq[Column]): Column =
      if (ks.isEmpty) lit(0)
      else struct(ks.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }: _*)
    val lKey = keyStruct(leftKeys.toSeq)
    val rKey = keyStruct(rightKeys.toSeq)
    val payload = rt.columns.filterNot(c => lt.columns.contains(c)).toSeq
    val joined0 = graft.operators.Joins.asofJoin(
      lt, rt, lKey, rKey, ltime, rtime, payload,
      direction = dir, leftOuter = leftOuter, rightOuter = rightOuter)
    // SEMI: an inner asof join emits each probe row at most once, so
    // semi = project the probe side's columns; ANTI = the probe rows
    // WITHOUT a match — multiset difference against the semi set
    // (reference asof semi/anti join family)
    val joined =
      if (semi) joined0.select(lt.columns.map(col).toIndexedSeq: _*)
      else if (anti)
        lt.exceptAll(joined0.select(lt.columns.map(col).toIndexedSeq: _*))
      else joined0
    val view = s"__asof_${viewId.incrementAndGet()}"
    joined.createOrReplaceTempView(view)
    strip(textHead) + "FROM " + view + " " + strip(tailR)
  }

  private def tableRef(spark: SparkSession, s: String): (String, Option[String]) = {
    val t = s.trim
    if (t.startsWith("(")) {
      // parenthesized relation (`(VALUES …) AS t1` / `(SELECT …) t1`):
      // materialize through the front door as a temp view. Bare
      // VALUES bodies get the reference's col0… column names (Spark
      // numbers them col1…).
      val close = SqlPasses.matchParen(t, 0)
      var df = graft.GraftSql.sql(spark, t.substring(1, close))
      if (t.substring(1, close).trim.toUpperCase.startsWith("VALUES") &&
          df.columns.forall(_.matches("col\\d+")))
        df = df.toDF(df.columns.map(c =>
          "col" + (c.stripPrefix("col").toInt - 1)).toIndexedSeq: _*)
      val aliasRaw = t.substring(close + 1).trim
      val aliasTok = aliasRaw.split("\\s+").filterNot(_.equalsIgnoreCase("AS"))
        .headOption.filter(_.nonEmpty)
      // `alias(col, …)` — a column-alias list renames the frame's
      // columns (`(VALUES …) p(begin)`, asof corpus) (r13)
      val alias = aliasTok.map(_.takeWhile(c => c.isLetterOrDigit || c == '_'))
        .filter(_.nonEmpty)
      if (alias.nonEmpty && aliasRaw.contains("(")) {
        val open = aliasRaw.indexOf('(')
        val cls = SqlPasses.matchParen(aliasRaw, open)
        val cols = aliasRaw.substring(open + 1, cls).split(",").map(_.trim)
          .map(_.stripPrefix("\"").stripSuffix("\""))
        if (cols.length == df.columns.length)
          df = df.toDF(cols.toIndexedSeq: _*)
      }
      val view = s"__asof_rel_${viewId.incrementAndGet()}"
      df.createOrReplaceTempView(view)
      // do NOT register the raw alias as a session view: it would
      // outlive the statement and shadow same-named catalog tables
      // for every later query (r13 advice). Alias qualifiers in the
      // spliced statement are handled by strip()/renameRefs instead.
      (view, alias)
    } else {
      val parts = t.split("\\s+").filterNot(_.equalsIgnoreCase("AS"))
      require(parts.nonEmpty && parts.length <= 2,
        s"ASOF JOIN: expected `table [alias]`, got: $s")
      (parts(0), parts.lift(1))
    }
  }

  private def splitAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cur = s
    var i = topIndexOf(cur, "AND")
    while (i >= 0) {
      out += cur.substring(0, i)
      cur = cur.substring(i + 3)
      i = topIndexOf(cur, "AND")
    }
    out += cur
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Find the one top-level comparison operator in a conjunct. */
  private def comparison(s: String): (String, String, String) = {
    var depth = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') { i += 1; while (i < n && s.charAt(i) != '\'') i += 1; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && (c == '<' || c == '>' || c == '=')) {
        val op =
          if (i + 1 < n && s.charAt(i + 1) == '=') s.substring(i, i + 2)
          else c.toString
        return (s.substring(0, i), op, s.substring(i + op.length))
      } else i += 1
    }
    throw new IllegalArgumentException(s"ASOF JOIN: no comparison in `$s`")
  }

  private def flip(op: String): String = op match {
    case ">=" => "<="
    case "<=" => ">="
    case ">"  => "<"
    case "<"  => ">"
    case "="  => "="
  }

  /** `<left> la ASOF [LEFT] JOIN <rel> ra[(cols)] USING (c)` — at ANY
    * depth — rewritten LAZILY to a LATERAL top-1 probe:
    *
    *   la [LEFT] JOIN LATERAL (SELECT * FROM <rel> __ab[(cols)]
    *     WHERE __ab.c <= la.c ORDER BY __ab.c DESC LIMIT 1) ra ON true
    *
    * This is the rewrite that composes with CORRELATED subqueries
    * (test_asof_join_subquery corpus): the statement-level rewrite
    * materializes the join eagerly, which a subquery referencing
    * outer columns cannot do, while the lateral form stays a plan
    * fragment. USING's single column is the inequality (backward
    * `>=`, the reference's bind_joinref default); multiplicity
    * matches the ASOF contract (exactly one matched right row; LEFT
    * keeps unmatched left rows NULL-padded). Plain relation or
    * `fn(args)` right sides only — the shapes the corpus uses.
    */
  private val UsingRe =
    ("""(?is)\bASOF\s+(LEFT\s+)?JOIN\s+""" +
      """([A-Za-z_]\w*(?:\s*\((?:[^()]|\([^()]*\))*\))?)""" + // rel / fn(args)
      """\s+(?:AS\s+)?([A-Za-z_]\w*)\s*(\(\s*[\w", ]*\s*\))?""" + // alias[(cols)]
      """\s+USING\s*\(\s*"?([A-Za-z_]\w*)"?\s*\)""").r

  /** Some(rewritten) when the text carries an ASOF…USING join. */
  def usingPass(text: String): Option[String] = {
    val m = UsingRe.findFirstMatchIn(text).getOrElse(return None)
    if (SqlPasses.inQuote(text, m.start)) return None
    val left = if (m.group(1) != null) "LEFT " else ""
    val rel = m.group(2)
    val alias = m.group(3)
    val cols = Option(m.group(4)).getOrElse("")
    val c = m.group(5)
    // the left alias: the identifier immediately before ASOF
    val la = "([A-Za-z_]\\w*)\\s*$".r
      .findFirstMatchIn(text.substring(0, m.start))
      .map(_.group(1)).getOrElse(return None)
    val lateral =
      s"${left}JOIN LATERAL (SELECT * FROM $rel __ab$cols " +
        s"WHERE __ab.$c <= $la.$c ORDER BY __ab.$c DESC LIMIT 1) $alias ON true"
    Some(text.substring(0, m.start) + lateral + text.substring(m.end))
  }
}
