package graft.queries

import scala.collection.mutable

/** JOB domain alignment by PLANTED WITNESS ROWS.
  *
  * The synthesized IMDB views (Imdb.viewDefs) cycle mined literals so
  * single-table filters select rows, but a JOB query conjoins filters
  * across 5–17 tables pinned to shared keys: satisfying them by
  * cycling alone needs a CRT solution whose modulus far exceeds the
  * key range, so ~half the queries returned all-NULL MINs (the joins
  * ran; no tuple survived). This module solves each query's
  * predicate + join graph directly: one satisfying row per alias —
  * join-equal columns share a fresh key from a union-find class,
  * literal predicates pick a satisfying value (eq / IN / LIKE-mega /
  * bounds), and a 3-valued evaluator re-checks the FULL predicate
  * before the rows are admitted. Admitted rows are appended to the
  * table views as constant VALUES arms.
  *
  * Correctness is structural: the witness rows are part of the view
  * TEXT, and the oracle (DuckDB) runs the identical text — both
  * engines see the same data by construction, so planting can only
  * turn all-NULL results into value-bearing ones, never cause drift.
  * Scale posture: constants — zero bytes scanned, zero shuffle.
  */
object ImdbWitness {

  // ------------------------------------------------------------- AST

  private sealed trait Ex
  private case class ColRef(alias: String, col: String) extends Ex
  private case class StrLit(v: String) extends Ex
  private case class NumLit(v: Double) extends Ex

  private sealed trait Pred
  private case class Cmp(op: String, l: Ex, r: Ex) extends Pred
  private case class InList(c: ColRef, vals: Seq[Any], neg: Boolean) extends Pred
  private case class LikeP(c: ColRef, pat: String, neg: Boolean) extends Pred
  private case class BetweenP(c: ColRef, lo: Ex, hi: Ex) extends Pred
  private case class NullP(c: ColRef, neg: Boolean) extends Pred
  private case class AndP(ps: Seq[Pred]) extends Pred
  private case class OrP(ps: Seq[Pred]) extends Pred

  // ----------------------------------------------------------- lexer

  private sealed trait Tk
  private case class W(s: String) extends Tk  // word (kw / ident)
  private case class S(s: String) extends Tk  // 'string'
  private case class N(v: Double) extends Tk
  private case class O(s: String) extends Tk  // operator / punct

  private def lex(text: String): Vector[Tk] = {
    val out = Vector.newBuilder[Tk]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          if (text.charAt(i) == '\'') {
            if (i + 1 < n && text.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
            else { i += 1; done = true }
          } else { sb += text.charAt(i); i += 1 }
        }
        out += S(sb.toString)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (text.charAt(i).isDigit || text.charAt(i) == '.')) i += 1
        out += N(text.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (text.charAt(i).isLetterOrDigit || text.charAt(i) == '_')) i += 1
        out += W(text.substring(start, i))
      } else {
        val two = if (i + 1 < n) text.substring(i, i + 2) else ""
        if (Seq("<>", "!=", ">=", "<=").contains(two)) { out += O(two); i += 2 }
        else { out += O(c.toString); i += 1 }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------- parser

  private final class P(ts: Vector[Tk]) {
    private var i = 0
    private def peek: Option[Tk] = if (i < ts.length) Some(ts(i)) else None
    private def next(): Tk = { val t = ts(i); i += 1; t }
    private def isW(s: String): Boolean = peek.exists {
      case W(w) => w.equalsIgnoreCase(s); case _ => false
    }
    private def isO(s: String): Boolean = peek.contains(O(s))
    private def expectO(s: String): Unit =
      if (isO(s)) next() else throw new IllegalArgumentException(s"expected $s")

    def parse(): Pred = { val p = orExpr(); require(i == ts.length, "trailing tokens"); p }

    private def orExpr(): Pred = {
      val parts = mutable.ArrayBuffer(andExpr())
      while (isW("OR")) { next(); parts += andExpr() }
      if (parts.length == 1) parts.head else OrP(parts.toSeq)
    }

    private def andExpr(): Pred = {
      val parts = mutable.ArrayBuffer(unary())
      while (isW("AND")) { next(); parts += unary() }
      if (parts.length == 1) parts.head else AndP(parts.toSeq)
    }

    private def unary(): Pred = {
      if (isO("(")) {
        // could be a parenthesized boolean OR a parenthesized operand;
        // try boolean first
        val save = i
        next()
        try { val p = orExpr(); expectO(")"); return p }
        catch { case _: Exception => i = save }
      }
      predicate()
    }

    private def operand(): Ex = next() match {
      case W(a) if isO(".") =>
        next()
        next() match {
          case W(c) => ColRef(a.toLowerCase, c.toLowerCase)
          case t => throw new IllegalArgumentException(s"bad column ref after $a.: $t")
        }
      case S(s) => StrLit(s)
      case N(v) => NumLit(v)
      case t => throw new IllegalArgumentException(s"bad operand: $t")
    }

    private def predicate(): Pred = {
      val l = operand()
      def colOf(e: Ex): ColRef = e match {
        case c: ColRef => c
        case _ => throw new IllegalArgumentException("expected column ref")
      }
      var neg = false
      if (isW("NOT")) { next(); neg = true }
      if (isW("IN")) {
        next(); expectO("(")
        val vals = mutable.ArrayBuffer.empty[Any]
        var done = false
        while (!done) next() match {
          case S(s) => vals += s
          case N(v) => vals += v
          case O(",") =>
          case O(")") => done = true
          case t => throw new IllegalArgumentException(s"bad IN item: $t")
        }
        InList(colOf(l), vals.toSeq, neg)
      } else if (isW("LIKE")) {
        next()
        next() match {
          case S(p) => LikeP(colOf(l), p, neg)
          case t => throw new IllegalArgumentException(s"bad LIKE pattern: $t")
        }
      } else if (isW("BETWEEN")) {
        next()
        val lo = operand()
        require(isW("AND"), "BETWEEN: expected AND"); next()
        val hi = operand()
        require(!neg, "NOT BETWEEN unsupported")
        BetweenP(colOf(l), lo, hi)
      } else if (isW("IS")) {
        next()
        var isNeg = false
        if (isW("NOT")) { next(); isNeg = true }
        require(isW("NULL"), "IS: expected NULL"); next()
        NullP(colOf(l), isNeg)
      } else {
        require(!neg, "NOT before comparison unsupported")
        val op = next() match {
          case O(o) if Seq("=", "<>", "!=", "<", ">", "<=", ">=").contains(o) => o
          case t => throw new IllegalArgumentException(s"bad comparison op: $t")
        }
        Cmp(if (op == "<>") "!=" else op, l, operand())
      }
    }
  }

  // --------------------------------------------------- constraint solve

  private final case class Constraints(
      var eq: Option[Any] = None,
      var options: Option[Seq[Any]] = None,
      var likes: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty,
      var notLikes: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty,
      var loNum: Option[Double] = None, var loStrict: Boolean = false,
      var hiNum: Option[Double] = None, var hiStrict: Boolean = false,
      var loStr: Option[String] = None, var loStrStrict: Boolean = false,
      var hiStr: Option[String] = None,
      var notNull: Boolean = false, var mustNull: Boolean = false,
      var avoid: mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty)

  /** Union-find over (alias, col) slots. */
  private final class UF {
    private val parent = mutable.Map.empty[(String, String), (String, String)]
    def find(x: (String, String)): (String, String) = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: (String, String), b: (String, String)): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
  }

  private def likeRegex(pat: String): String =
    pat.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+?^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  private def matchesLike(v: String, pat: String): Boolean =
    java.util.regex.Pattern.compile("(?s)^" + likeRegex(pat) + "$").matcher(v).matches()

  /** One query's witness rows: table → one row per alias
    * ((alias, col→value)), or None when the predicate can't be
    * satisfied by this construction (evaluator veto).
    */
  def witnessRows(q: String, qIdx: Int): Option[Seq[(String, Map[String, Any])]] = {
    try witnessImpl(q, qIdx)
    catch {
      case e: Exception =>
        if (sys.env.contains("IMDB_WITNESS_DEBUG")) throw e
        None
    }
  }

  private def aliasMap(q: String): Map[String, String] = {
    // word-boundary search: a SELECT alias like `from_company` must
    // not be mistaken for the FROM keyword
    val fromIdx = """(?i)(?<![\w.])FROM(?![\w])""".r
      .findFirstMatchIn(q).map(_.start).getOrElse(-1)
    val whereIdx = """(?i)(?<![\w.])WHERE(?![\w])""".r
      .findFirstMatchIn(q).map(_.start).getOrElse(-1)
    val clause = q.substring(fromIdx + 4, if (whereIdx > 0) whereIdx else q.length)
    clause.split(',').flatMap { part =>
      val ws = part.trim.split("\\s+AS\\s+|\\s+")
      if (ws.length >= 2) Some(ws.last.trim.toLowerCase -> ws.head.trim.toLowerCase)
      else if (ws.length == 1 && ws.head.nonEmpty)
        Some(ws.head.trim.toLowerCase -> ws.head.trim.toLowerCase)
      else None
    }.toMap
  }

  private def witnessImpl(q: String, qIdx: Int): Option[Seq[(String, Map[String, Any])]] = {
    val am = aliasMap(q)
    val up = q.toUpperCase
    val whereIdx = up.indexOf("WHERE")
    if (whereIdx < 0) return None
    val whereText = q.substring(whereIdx + 5).trim.stripSuffix(";")
    val pred = new P(lex(whereText)).parse()

    // 1) conjunct walk: unions from equalities, constraints from
    //    literal predicates; OR nodes contribute their FIRST branch
    val uf = new UF
    val cons = mutable.Map.empty[(String, String), Constraints]
    def cOf(c: ColRef) = cons.getOrElseUpdate(uf.find((c.alias, c.col)), Constraints())

    def collect(p: Pred): Unit = p match {
      case AndP(ps) => ps.foreach(collect)
      case OrP(ps) => collect(ps.head)
      case Cmp("=", a: ColRef, b: ColRef) => uf.union((a.alias, a.col), (b.alias, b.col))
      case Cmp(op, a: ColRef, b: ColRef) =>
        // relational column-column: v op v holds for <=, >=; strict
        // ops get vetoed by the evaluator if they end up violated
        if (op == "<=" || op == ">=") uf.union((a.alias, a.col), (b.alias, b.col))
      case _ =>
    }
    collect(pred)
    // second pass for value constraints AFTER all unions exist
    def collectVals(p: Pred): Unit = p match {
      case AndP(ps) => ps.foreach(collectVals)
      case OrP(ps) => collectVals(ps.head)
      case Cmp("=", c: ColRef, StrLit(v)) => cOf(c).eq = Some(v)
      case Cmp("=", c: ColRef, NumLit(v)) => cOf(c).eq = Some(v)
      case Cmp("=", StrLit(v), c: ColRef) => cOf(c).eq = Some(v)
      case Cmp("=", NumLit(v), c: ColRef) => cOf(c).eq = Some(v)
      case Cmp("!=", c: ColRef, StrLit(v)) => cOf(c).avoid += v
      case Cmp("!=", c: ColRef, NumLit(v)) => cOf(c).avoid += v
      case Cmp(op, c: ColRef, NumLit(v)) => op match {
        case ">" => val k = cOf(c); k.loNum = Some(v); k.loStrict = true
        case ">=" => cOf(c).loNum = Some(v)
        case "<" => val k = cOf(c); k.hiNum = Some(v); k.hiStrict = true
        case "<=" => cOf(c).hiNum = Some(v)
        case _ =>
      }
      case Cmp(op, NumLit(v), c: ColRef) => op match { // mirrored
        case "<" => val k = cOf(c); k.loNum = Some(v); k.loStrict = true
        case "<=" => cOf(c).loNum = Some(v)
        case ">" => val k = cOf(c); k.hiNum = Some(v); k.hiStrict = true
        case ">=" => cOf(c).hiNum = Some(v)
        case _ =>
      }
      case Cmp(op, c: ColRef, StrLit(v)) => op match {
        case ">" => val k = cOf(c); k.loStr = Some(v); k.loStrStrict = true
        case ">=" => cOf(c).loStr = Some(v)
        case "<" | "<=" => cOf(c).hiStr = Some(v)
        case _ =>
      }
      case Cmp(op, StrLit(v), c: ColRef) => op match { // mirrored
        case "<" => val k = cOf(c); k.loStr = Some(v); k.loStrStrict = true
        case "<=" => cOf(c).loStr = Some(v)
        case ">" | ">=" => cOf(c).hiStr = Some(v)
        case _ =>
      }
      case InList(c, vals, false) => cOf(c).options = Some(vals)
      case InList(c, vals, true) => cOf(c).avoid ++= vals
      case LikeP(c, p2, false) => cOf(c).likes += p2
      case LikeP(c, p2, true) => cOf(c).notLikes += p2
      case BetweenP(c, lo, hi) => (lo, hi) match {
        case (NumLit(a), NumLit(b)) =>
          val k = cOf(c); k.loNum = Some(a); k.hiNum = Some(b)
        case (StrLit(a), StrLit(b)) =>
          val k = cOf(c); k.loStr = Some(a); k.hiStr = Some(b)
        case _ =>
      }
      case NullP(c, true) => cOf(c).notNull = true
      case NullP(c, false) => cOf(c).mustNull = true
      case _ =>
    }
    collectVals(pred)

    // 2) value assignment per class
    val classVal = mutable.Map.empty[(String, String), Any]
    var freshSeq = 0
    def freshId(): Long = {
      freshSeq += 1
      10_000_000_000L + qIdx.toLong * 1000L + freshSeq.toLong
    }
    def assign(root: (String, String), k: Constraints): Any = {
      if (k.mustNull) return null
      k.eq match {
        case Some(v) => return v
        case None =>
      }
      k.options.foreach { opts =>
        val ok = opts.find {
          case s: String =>
            !k.avoid.contains(s) && k.notLikes.forall(p => !matchesLike(s, p))
          case v => !k.avoid.contains(v)
        }
        return ok.getOrElse(opts.head)
      }
      if (k.likes.nonEmpty) {
        // mega value: concatenate the positive patterns' cores so one
        // string matches every %core% pattern; vetoed later if a
        // non-substring pattern or NOT LIKE disagrees
        val cores = k.likes.map(_.stripPrefix("%").stripSuffix("%")
          .replace("%", "0").replace("_", "x"))
        val anchoredPrefix = k.likes.find(p => !p.startsWith("%"))
        val anchoredSuffix = k.likes.find(p => !p.endsWith("%"))
        val mid = cores.mkString(" ")
        val v = (anchoredPrefix, anchoredSuffix) match {
          case (Some(p), _) if k.likes.length == 1 =>
            p.stripSuffix("%").replace("%", " " + mid + " ").replace("_", "x") +
              (if (p.endsWith("%")) "" else "")
          case _ => mid
        }
        return v
      }
      if (k.loNum.isDefined || k.hiNum.isDefined) {
        val lo = k.loNum.map(v => if (k.loStrict) v + 1 else v)
        val hi = k.hiNum.map(v => if (k.hiStrict) v - 1 else v)
        val v = lo.orElse(hi).getOrElse(0.0)
        return v
      }
      if (k.loStr.isDefined || k.hiStr.isDefined)
        // strict lower bound: appending a char makes it strictly
        // greater lexicographically; '!' sorts below digits/letters
        return k.loStr.map(v => if (k.loStrStrict) v + "0" else v).getOrElse("!")
      if (k.notNull || k.avoid.nonEmpty) {
        // any value avoiding != / NOT IN literals and NOT LIKEs
        val cands = Seq(s"w$qIdx", s"w${qIdx}b", s"w${qIdx}c")
        return cands.find(v => !k.avoid.contains(v) &&
          k.notLikes.forall(p => !matchesLike(v, p))).getOrElse(s"w$qIdx")
      }
      // unconstrained class: key-ish columns get a fresh join id
      null
    }
    // build slot → class, assign values
    val slots = cons.keys.toSeq ++ {
      // every slot that was unioned but has no constraints object
      val seen = mutable.Set.empty[(String, String)]
      def slotsOf(p: Pred): Unit = p match {
        case AndP(ps) => ps.foreach(slotsOf)
        case OrP(ps) => ps.foreach(slotsOf)
        case Cmp(_, a, b) =>
          Seq(a, b).foreach { case c: ColRef => seen += ((c.alias, c.col)); case _ => }
        case InList(c, _, _) => seen += ((c.alias, c.col))
        case LikeP(c, _, _) => seen += ((c.alias, c.col))
        case BetweenP(c, _, _) => seen += ((c.alias, c.col))
        case NullP(c, _) => seen += ((c.alias, c.col))
      }
      slotsOf(pred)
      seen.toSeq
    }
    val roots = slots.map(uf.find).distinct
    roots.foreach { r =>
      val k = cons.getOrElse(r, Constraints())
      val v = assign(r, k)
      classVal(r) = if (v == null && (r._2 == "id" || r._2.endsWith("_id")))
        freshId()
      else v
    }

    // 3) evaluate the FULL predicate against the witness env
    def valueOf(c: ColRef): Any = classVal.getOrElse(uf.find((c.alias, c.col)), null)
    def evalEx(e: Ex): Any = e match {
      case c: ColRef => valueOf(c)
      case StrLit(v) => v
      case NumLit(v) => v
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (null, _) | (_, null) => None
      case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
      case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
      case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
      case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x, y) => Some(x.toString.compareTo(y.toString))
    }
    def eval(p: Pred): Option[Boolean] = p match {
      case AndP(ps) =>
        val es = ps.map(eval)
        if (es.contains(Some(false))) Some(false)
        else if (es.exists(_.isEmpty)) None else Some(true)
      case OrP(ps) =>
        val es = ps.map(eval)
        if (es.contains(Some(true))) Some(true)
        else if (es.exists(_.isEmpty)) None else Some(false)
      case Cmp(op, l, r) =>
        cmp(evalEx(l), evalEx(r)).map { c =>
          op match {
            case "=" => c == 0
            case "!=" => c != 0
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          }
        }
      case InList(c, vals, neg) => Option(valueOf(c)).map { v =>
        val in = vals.exists(x => cmp(v, x).contains(0))
        if (neg) !in else in
      }
      case LikeP(c, pat, neg) => valueOf(c) match {
        case s: String => Some(if (neg) !matchesLike(s, pat) else matchesLike(s, pat))
        case null => None
        case other => Some(if (neg) !matchesLike(other.toString, pat)
          else matchesLike(other.toString, pat))
      }
      case BetweenP(c, lo, hi) =>
        for (a <- cmp(valueOf(c), evalEx(lo)); b <- cmp(valueOf(c), evalEx(hi)))
          yield a >= 0 && b <= 0
      case NullP(c, neg) =>
        val isNull = valueOf(c) == null
        Some(if (neg) !isNull else isNull)
    }
    if (!eval(pred).contains(true)) return None

    // 4) emit one row per alias: class values where the slot exists,
    //    deterministic fillers for untouched payload columns
    val rows = am.toSeq.map { case (alias, table) =>
      val schema = Imdb.tableSchema(table)
      val row = schema.map { case (col, kind) =>
        val root = uf.find((alias, col))
        val v =
          if (classVal.contains(root)) classVal(root)
          else if (col == "id" || col.endsWith("_id")) null // never joins
          else if (kind == "S") s"w$qIdx" // payload filler: output MINs stay non-NULL
          else null
        col -> v
      }.toMap
      (table, row)
    }
    Some(rows)
  }

  /** All admitted witness rows across the 113 queries, grouped by
    * table. Computed once; pure string/CP work (no Spark).
    */
  lazy val rowsByTable: Map[String, Seq[Map[String, Any]]] = {
    val acc = mutable.Map.empty[String, mutable.ArrayBuffer[Map[String, Any]]]
    Imdb.queries.zipWithIndex.foreach { case ((_, q), qi) =>
      witnessRows(q, qi).foreach(_.foreach { case (t, row) =>
        acc.getOrElseUpdate(t, mutable.ArrayBuffer.empty) += row
      })
    }
    acc.view.mapValues(_.toSeq).toMap
  }

  /** The VALUES arm appended to a table's view body, or empty. */
  def valuesArm(table: String): String = {
    val rows = rowsByTable.getOrElse(table, Nil)
    if (rows.isEmpty) return ""
    val schema = Imdb.tableSchema(table)
    def render(v: Any, kind: String): String = v match {
      case null => if (kind == "S") "CAST(NULL AS VARCHAR)" else "CAST(NULL AS BIGINT)"
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: Double =>
        val asLong = d.toLong
        val num = if (asLong.toDouble == d) asLong.toString else d.toString
        if (kind == "S") s"'$num'" else s"CAST($num AS BIGINT)"
      case l: Long => if (kind == "S") s"'$l'" else s"CAST($l AS BIGINT)"
      case other => other.toString
    }
    val tuples = rows.map { row =>
      "(" + schema.map { case (c, kind) => render(row(c), kind) }.mkString(", ") + ")"
    }
    val cols = schema.map(_._1).mkString(", ")
    s"\n  UNION ALL SELECT * FROM (VALUES ${tuples.mkString(", ")}) AS w($cols)"
  }
}
