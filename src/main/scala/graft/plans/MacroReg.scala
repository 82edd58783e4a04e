package graft.plans

import java.util.concurrent.ConcurrentHashMap

import graft.sources.DmlSql.topSplit

/** CREATE MACRO through the front door (reference
  * src/parser/parsed_data/create_macro_info.cpp): DuckDB macros are
  * untyped SQL expressions inlined at bind time, so the faithful
  * Spark analog is textual expansion before translation — the macro
  * body lands in the caller's plan exactly like the reference's
  * binder inlines it (and like MacroSpec's typed SQL-UDF analog, but
  * without demanding parameter types DuckDB never had).
  */
object MacroReg {
  private val macros = new ConcurrentHashMap[String, (Seq[String], String)]()

  // CREATE FUNCTION is the reference's alias for CREATE MACRO
  // (create_macro_info.cpp registers both spellings); TEMP/TEMPORARY
  // is a no-op scope (macros here are session-lived anyway)
  private val Create =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?(?:MACRO|FUNCTION)\s+(?:IF\s+NOT\s+EXISTS\s+)?("[^"]+"|[A-Za-z_][\w.]*)\s*\(([^)]*)\)\s+AS\s+(.+?)\s*;?\s*$""".r

  def isCreate(text: String): Boolean = Create.findFirstIn(text).isDefined

  /** DROP MACRO [IF EXISTS] name (reference drop_statement.cpp —
    * macros share the generic DROP verb). */
  val DropRe =
    """(?is)^\s*DROP\s+(?:MACRO|FUNCTION)\s+(?:TABLE\s+)?(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*;?\s*$""".r

  def drop(name: String, ifExists: Boolean): Unit = {
    val bare = name.substring(name.lastIndexOf('.') + 1)
    val had = macros.remove(bare.toLowerCase) != null
    require(had || ifExists, s"DROP MACRO: no macro named $name")
  }

  def register(text: String): Unit = text match {
    case Create(name, params, body) =>
      // schema qualifiers register under the bare name (the session
      // catalog here is single-schema); `AS TABLE <query>` macros
      // expand like scalar ones — the parenthesized body is a valid
      // FROM-position subquery
      val bare = name.stripPrefix("\"").stripSuffix("\"")
        .substring(name.stripPrefix("\"").stripSuffix("\"").lastIndexOf('.') + 1)
      val b = body.trim.replaceFirst("(?is)^TABLE\\s+", "")
      macros.put(bare.toLowerCase,
        (params.split(',').map(_.trim).filter(_.nonEmpty).toSeq, b))
    case _ => throw new IllegalArgumentException(
      s"CREATE MACRO: unsupported shape (scalar `name(p, …) AS expr` only): $text")
  }

  def nonEmpty: Boolean = !macros.isEmpty

  def clearAll(): Unit = macros.clear()

  /** Expand macro calls textually, innermost-out, to a fixpoint
    * (macros may call macros — reference macros compose the same
    * way). Parameters substitute at identifier boundaries, arguments
    * parenthesized.
    */
  def expand(sql0: String): String = {
    if (macros.isEmpty) return sql0
    var sql = sql0
    var rounds = 0
    var changed = true
    while (changed && rounds < 10) {
      changed = false
      rounds += 1
      macros.forEach { (name, defn) =>
        val (params, body) = defn
        // schema-qualified call sites (main.my_macro(..)) expand too —
        // macros registered bare, the qualifier names the schema
        val CallRe = ("(?i)(?<![\\w.])(?:[A-Za-z_]\\w*\\.)?" +
          java.util.regex.Pattern.quote(name) + "\\s*\\(").r
        var m = CallRe.findFirstMatchIn(sql)
        var spins = 0
        while (m.isDefined && spins < 64) {
          spins += 1
          val open = sql.indexOf('(', m.get.start)
          val close = SqlPasses.matchParen(sql, open)
          val args = topSplit(sql.substring(open + 1, close), ',')
          require(args.length == params.length,
            s"macro $name expects ${params.length} args, got ${args.length}")
          var expanded = body
          params.zip(args).foreach { case (p, a) =>
            expanded = expanded.replaceAll(
              "(?i)\\b" + java.util.regex.Pattern.quote(p) + "\\b",
              java.util.regex.Matcher.quoteReplacement(s"($a)"))
          }
          sql = sql.substring(0, m.get.start) + s"($expanded)" + sql.substring(close + 1)
          changed = true
          m = CallRe.findFirstMatchIn(sql)
        }
      }
    }
    sql
  }
}
