package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** SQL session variables — the reference's `SET VARIABLE name = expr`
  * / `RESET VARIABLE name` statements and the `getvariable('name')`
  * scalar (/root/reference/src/parser/statement/set_statement.cpp,
  * src/function/scalar/generic/getvariable.cpp; semantics pinned
  * against test/sql/variables/test_variables.test):
  *
  *   - SET VARIABLE evaluates the right-hand side eagerly as a
  *     single value (scalar subqueries included); more than one
  *     row/column is the reference's "can only handle a single
  *     value" error.
  *   - getvariable('x') is a BIND-TIME constant: the front door
  *     splices the stored value in as a literal before Catalyst ever
  *     sees the text (the reference folds it in the binder the same
  *     way). An unset variable reads as NULL.
  *   - `duckdb_variables()` / SHOW VARIABLES list (name, value, type)
  *     with the reference's type spellings (queries.DuckTypes).
  *
  * JVM-global like the session itself (same scoping as the macro
  * registry and prepared statements).
  */
object Variables {

  /** stored value: SQL literal rendering + display text + duck type */
  final case class VarVal(literal: String, display: String, duckType: String)

  private val vars = new ConcurrentHashMap[String, VarVal]()

  val SetVarRe =
    """(?is)^\s*SET\s+VARIABLE\s+(\w+)\s*=\s*(.+?)\s*;?\s*$""".r
  val ResetVarRe = """(?is)^\s*RESET\s+VARIABLE\s+(\w+)\s*;?\s*$""".r
  val ShowVarRe = """(?is)^\s*SHOW\s+VARIABLES\s*;?\s*$""".r

  def set(spark: SparkSession, name: String, exprText: String): Unit = {
    val df = graft.GraftSql.sql(spark, s"SELECT ${exprText.trim} AS __v")
    require(df.columns.length == 1,
      "SET VARIABLE can only handle a single value")
    val rows = df.limit(2).collect()
    require(rows.length <= 1,
      "SET VARIABLE can only handle a single value")
    val v = if (rows.isEmpty) null else rows(0).get(0)
    val dt = df.schema.fields(0).dataType
    vars.put(name.toLowerCase,
      VarVal(renderLiteral(v, dt), renderDisplay(v),
        graft.queries.DuckTypes.name(dt)))
  }

  def reset(name: String): Unit = vars.remove(name.toLowerCase)

  def clearAll(): Unit = vars.clear()

  /** (name, value, type) rows — duckdb_variables() / SHOW VARIABLES. */
  def listDf(spark: SparkSession): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    val sorted = {
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, VarVal)]
      vars.forEach((k, v) => b += ((k, v)))
      b.sortBy(_._1)
    }
    sorted.foreach { case (k, v) => rows.add(Row(k, v.display, v.duckType)) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("value", StringType, nullable = true),
      StructField("type", StringType, nullable = false))))
  }

  /** Splice `getvariable('x')` calls as literals (bind-time
    * constant-fold) and `duckdb_variables()` as a fresh temp view,
    * skipping string-literal spans. Returns the text unchanged when
    * neither appears (the common path stays zero-cost).
    */
  def substitute(spark: SparkSession, text: String): String = {
    val lower = text.toLowerCase
    if (!lower.contains("getvariable") && !lower.contains("duckdb_variables") &&
        !lower.contains("duckdb_secrets"))
      return text
    val sb = new StringBuilder
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\'') { // string literal ('' doubling) — copy verbatim
        sb += c; i += 1
        while (i < n && text.charAt(i) != '\'') { sb += text.charAt(i); i += 1 }
        if (i < n) { sb += '\''; i += 1 }
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (text.charAt(i).isLetterOrDigit || text.charAt(i) == '_')) i += 1
        val word = text.substring(start, i)
        var j = i
        while (j < n && text.charAt(j).isWhitespace) j += 1
        if (word.equalsIgnoreCase("getvariable") && j < n && text.charAt(j) == '(') {
          val close = SqlPasses.matchParen(text, j)
          val arg = text.substring(j + 1, close).trim
          require(arg.length >= 2 && arg.head == '\'' && arg.last == '\'',
            s"getvariable: expected a string literal, got: $arg")
          val name = arg.substring(1, arg.length - 1).replace("''", "'")
          sb ++= Option(vars.get(name.toLowerCase)).map(_.literal).getOrElse("NULL")
          i = close + 1
        } else if (word.equalsIgnoreCase("duckdb_variables") && j < n && text.charAt(j) == '(') {
          val close = SqlPasses.matchParen(text, j)
          listDf(spark).createOrReplaceTempView("__duckdb_variables")
          sb ++= "__duckdb_variables"
          i = close + 1
        } else if (word.equalsIgnoreCase("duckdb_secrets") && j < n && text.charAt(j) == '(') {
          val close = SqlPasses.matchParen(text, j)
          Secrets.listDf(spark).createOrReplaceTempView("__duckdb_secrets")
          sb ++= "__duckdb_secrets"
          i = close + 1
        } else sb ++= word
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------- literal rendering

  /** Render a collected value back to a SQL literal of its type. */
  private[graft] def renderLiteral(v: Any, dt: DataType): String = {
    import org.apache.spark.sql.types._
    if (v == null) return s"CAST(NULL AS ${dt.sql})"
    (v, dt) match {
      case (s: String, _) => "'" + s.replace("'", "''") + "'"
      case (d: java.sql.Date, _) => s"DATE '$d'"
      case (d: java.time.LocalDate, _) => s"DATE '$d'"
      case (t: java.sql.Timestamp, _) => s"TIMESTAMP '$t'"
      case (t: java.time.Instant, _) =>
        s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
      case (b: Array[Byte], _) => s"X'${b.map("%02X".format(_)).mkString}'"
      case (d: java.math.BigDecimal, _) =>
        s"CAST(${d.toPlainString} AS ${dt.sql})"
      case (d: BigDecimal, _) => s"CAST(${d.toString} AS ${dt.sql})"
      case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
        s"array(${a.map(renderLiteral(_, et)).mkString(", ")})"
      case (r: Row, StructType(fields)) =>
        val parts = fields.zipWithIndex.map { case (f, k) =>
          s"'${f.name}', ${renderLiteral(r.get(k), f.dataType)}"
        }
        s"named_struct(${parts.mkString(", ")})"
      case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
        val parts = m.toSeq.flatMap { case (k, x) =>
          Seq(renderLiteral(k, kt), renderLiteral(x, vt))
        }
        s"map(${parts.mkString(", ")})"
      case (f: Float, _) => s"CAST($f AS FLOAT)"
      case (x, _) => x.toString // Int/Long/Double/Boolean/Short/Byte
    }
  }

  /** The reference's display rendering (what duckdb_variables shows):
    * lists as [a, b], strings bare.
    */
  private def renderDisplay(v: Any): String = v match {
    case null => null
    case a: scala.collection.Seq[_] =>
      s"[${a.map(renderDisplay).mkString(", ")}]"
    case x => x.toString
  }
}
