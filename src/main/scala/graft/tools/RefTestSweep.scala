package graft.tools

import scala.collection.mutable

/** Robustness sweep over the reference's OWN sqllogictest corpus
  * (every .test file under /root/reference/test/sql — read-only spec
  * input): every
  * `statement ok` / `query` SQL text is fed through the dialect
  * front door's translator, and the translation through Spark's
  * parser (syntax only — the tests' tables don't exist here, so
  * analysis cannot run). `statement error` blocks are skipped: those
  * texts are DESIGNED to fail. Statements carrying harness
  * placeholders (__TEST_DIR__ etc.) or loop variables are skipped as
  * non-SQL.
  *
  * The numbers this prints are a TRANSLATOR robustness metric
  * ("does the front door crash on real reference inputs"), not a
  * semantics claim — semantic parity is the oracle gate's job.
  *
  * Run: tools/run_main.sh graft.tools.RefTestSweep [subtreeFilter]
  */
object RefTestSweep {
  private val root = new java.io.File("/root/reference/test/sql")

  private def testFiles(dir: java.io.File): Iterator[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.iterator.filter(_.isFile).filter(_.getName.endsWith(".test")) ++
      kids.iterator.filter(_.isDirectory).flatMap(testFiles)
  }

  /** (file, sql) for every statement-ok/query block. */
  def statements(filter: String): Iterator[(String, String)] =
    testFiles(root).filter(_.getPath.contains(filter)).flatMap { f =>
      val lines =
        try scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
        catch { case _: Exception => Vector.empty }
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var i = 0
      while (i < lines.length) {
        val l = lines(i).trim
        val isStmt = l == "statement ok" || l.startsWith("statement ok ")
        val isQuery = l.startsWith("query ")
        if (isStmt || isQuery) {
          i += 1
          val sql = new StringBuilder
          // a directly-following directive line (no blank separator)
          // starts a NEW block — gluing it into this block's SQL
          // grades harness text as SQL
          def directive(l: String): Boolean =
            l.startsWith("statement ") || l.startsWith("query ") ||
              l.startsWith("require ") || l.startsWith("mode ") ||
              l.startsWith("loop ") || l == "endloop" ||
              l.startsWith("restart") || l.startsWith("load ") ||
              l.startsWith("sleep ") || l.startsWith("concurrentloop ")
          while (i < lines.length && lines(i).trim.nonEmpty &&
              lines(i).trim != "----" && !directive(lines(i).trim)) {
            // sqllogictest '#' comment lines inside a block are
            // harness comments, not SQL
            if (!lines(i).trim.startsWith("#")) {
              if (sql.nonEmpty) sql.append('\n')
              sql.append(lines(i))
            }
            i += 1
          }
          val text = sql.toString
          if (text.nonEmpty && !text.contains("__TEST_DIR__") &&
              !text.contains("__WORKING_DIRECTORY__") &&
              !text.contains("${") && !text.contains("__BUILD_DIRECTORY__"))
            // a block can hold several ';'-separated statements — the
            // real front door splits them in runScript; grade each
            graft.sources.DmlSql.topSplit(text, ';')
              .map(_.trim).filter(_.nonEmpty)
              // skip sqllogictest parameter placeholders (bare '?')
              .filterNot(s => """(^|[\s(,=<>+\-*/|])\?([\s(),;=<>+\-*/|]|$)""".r
                .findFirstIn(stripStringLiterals(s)).isDefined)
              .foreach(s => out += ((f.getPath, s)))
        }
        i += 1
      }
      out
    }

  private def stripStringLiterals(s: String): String =
    s.replaceAll("'[^']*'", "''")

  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parser = spark.sessionState.sqlParser
    graft.plans.DuckDialect.nativeTime = true // GraftSession enables TimeType

    // Verbs GraftSql routes at the STATEMENT layer — in real
    // execution these never reach Spark's parser, so grading their
    // translation through parsePlan would be a false failure.
    val routedVerb = ("""(?is)^\s*(PRAGMA|SET|RESET|BEGIN|START|COMMIT|ROLLBACK|ABORT|END|""" +
      """PREPARE|EXECUTE|DEALLOCATE|CALL|VACUUM|COPY|ATTACH|DETACH|EXPORT|IMPORT|""" +
      """EXPLAIN|SUMMARIZE|DESCRIBE|SHOW|UPDATE|DELETE|MERGE|ALTER|TRUNCATE|""" +
      """(?:FORCE\s+)?CHECKPOINT|PIVOT|PIVOT_WIDER|UNPIVOT|PIVOT_LONGER|COMMENT|""" +
      """DROP\s+MACRO|""" +
      """CREATE\s+(?:OR\s+REPLACE\s+)?(?:PERSISTENT\s+|TEMPORARY\s+)?SECRET|DROP\s+(?:PERSISTENT\s+|TEMP(?:ORARY)?\s+)?SECRET|""" +
      """CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?(?:MACRO|FUNCTION)\s+[\w.]+\s*\(|DROP\s+FUNCTION|CREATE\s+(?:TEMP(?:ORARY)?\s+)?TYPE|DROP\s+TYPE|""" +
      """CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?SEQUENCE|DROP\s+SEQUENCE|ANALYZE|CREATE\s+(?:UNIQUE\s+)?INDEX|DROP\s+INDEX)\b.*""").r

    // CREATE TYPE … AS ENUM registers session state the translator
    // consults when the type name later appears in DDL — replay those
    // registrations so the sweep sees the same state the front door
    // would (the sweep is otherwise stateless)
    val enumReg = graft.plans.EnumTypes.CreateTypeRe
    val aliasReg = graft.plans.EnumTypes.CreateAliasRe

    var total = 0
    var routed = 0
    var transOk = 0
    var parseOk = 0
    val crashes = mutable.LinkedHashMap.empty[String, (Int, String)]
    val parseFails = mutable.LinkedHashMap.empty[String, (Int, String)]

    var lastFile = ""
    statements(filter).foreach { case (file, sql) =>
      total += 1
      // macro registrations are per-connection in the reference's
      // harness — reset at file boundaries so a test's `range`/`test`
      // macro can't contaminate every later statement
      if (file != lastFile) { graft.plans.MacroReg.clearAll(); lastFile = file }
      sql match {
        case enumReg(name, vals) =>
          try graft.plans.EnumTypes.register(name, vals)
          catch { case _: Exception => }
        case aliasReg(name, ty) =>
          try graft.plans.EnumTypes.registerAlias(name, ty)
          catch { case _: Exception => }
        case _ =>
          // macro registrations are session state later statements in
          // the same corpus call through — replay like CREATE TYPE
          if (graft.plans.MacroReg.isCreate(sql))
            try graft.plans.MacroReg.register(sql)
            catch { case _: Exception => }
      }
      // statement layers the front door routes before Spark's parser:
      // the regex verbs, DML with upsert/RETURNING (sources/DmlSql),
      // and ASOF JOIN statement syntax (plans/AsofSql)
      def statementFormPivot: Boolean =
        // FROM-first included: pivot_6390's `FROM (PIVOT t ON … GROUP
        // BY …) JOIN (PIVOT …)` executes through PivotStmt (verified
        // end-to-end via Scratch, r10) — the parenthesized verb always
        // carries the `PIVOT <rel> ON` shape the scan below requires
        ("(?is)^\\s*(WITH|SELECT|FROM|CREATE\\s+TABLE|" +
          "CREATE\\s+(OR\\s+REPLACE\\s+)?(TEMP(ORARY)?\\s+)?VIEW)\\b")
          .r.findFirstIn(sql).isDefined && {
          // depth-0 scan for a statement-form PIVOT/UNPIVOT verb
          // (GraftSql routes these through plans/PivotStmt even when a
          // WITH clause precedes the verb)
          var depth = 0
          var i = 0
          var found = false
          val lower = sql.toLowerCase
          while (i < lower.length && !found) {
            val c = lower.charAt(i)
            if (c == '\'') { i += 1; while (i < lower.length && lower.charAt(i) != '\'') i += 1 }
            else if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            else if ((lower.startsWith("pivot", i) || lower.startsWith("unpivot", i)) &&
                (i == 0 || !lower.charAt(i - 1).isLetterOrDigit) &&
                // statement-form verb (`PIVOT <rel> ON …`) — routed by
                // PivotStmt's keyword scan at ANY depth; a FROM-suffix
                // `rel PIVOT (…)` group is translate's job instead
                (depth == 0 ||
                  "^(un)?pivot\\s+[\\w.\\\"]+\\s+on\\b".r
                    .findFirstIn(lower.substring(i)).isDefined))
              found = true
            i += 1
          }
          found
        }
      val layerRouted = routedVerb.pattern.matcher(sql).matches() ||
        (try graft.plans.MacroReg.isCreate(sql) catch { case _: Exception => false }) ||
        statementFormPivot ||
        graft.GraftSql.FromSuffixPivot.findFirstIn(sql).isDefined ||
        (try graft.sources.DmlSql.matches(sql) catch { case _: Exception => false }) ||
        // WITH-prefixed DML: GraftSql materializes the CTE list as
        // temp views and re-enters with the bare DML statement
        (try sql.trim.toUpperCase.startsWith("WITH") &&
          graft.plans.PivotStmt.cteTail(sql).exists { case (_, rest) =>
            "(?is)^\\s*(UPDATE|DELETE|MERGE)\\b".r.findFirstIn(rest).isDefined }
         catch { case _: Exception => false }) ||
        (try graft.plans.AsofSql.matches(sql) catch { case _: Exception => false }) ||
        // ASOF … USING at any depth: GraftSql's lazy LATERAL rewrite
        (try graft.plans.AsofSql.usingPass(sql).isDefined
         catch { case _: Exception => false }) ||
        // UNION BY NAME / LIMIT n% / comment-only blocks: GraftSql
        // statement-layer passes
        "(?is)\\bUNION\\s+(ALL\\s+)?BY\\s+NAME\\b".r.findFirstIn(sql).isDefined ||
        // NATURAL SEMI/ANTI rewrites in GraftSql's schema-aware
        // naturalSemiAntiPass (catalog-probed USING list)
        "(?is)\\bNATURAL\\s+(SEMI|ANTI)\\s+JOIN\\b".r.findFirstIn(sql).isDefined ||
        // POSITIONAL JOIN resolves in GraftSql's positionalJoinPass
        // (row_number zip + FULL JOIN; q35's operator form)
        "(?is)\\bPOSITIONAL\\s+JOIN\\b".r.findFirstIn(sql).isDefined ||
        // COLUMNS('re') / *COLUMNS(*) expand in GraftSql's schema-aware
        // columnsPass BEFORE Spark's parser (f51-gated) — parse-grading
        // the unexpanded text would be a false failure
        "(?is)(^|[^\\w])COLUMNS\\s*\\(".r.findFirstIn(sql).isDefined ||
        // `* REPLACE (expr AS col, …)` — and the paren-free single
        // form `* REPLACE expr AS col` — expand in GraftSql's
        // schema-aware starReplacePass (f50-gated) — same reasoning
        "(?is)\\*\\s*(EXCLUDE|EXCEPT|REPLACE)\\s*\\(".r.findFirstIn(sql).isDefined ||
        "(?is)\\*\\s*REPLACE\\s+\\S".r.findFirstIn(sql).isDefined ||
        // `(DESCRIBE …)` / `(SUMMARIZE …)` relations materialize in
        // GraftSql's subStatementPass (s16/s10-gated) — same reasoning
        "(?i)\\(\\s*(DESCRIBE|SUMMARIZE|SHOW)\\b".r.findFirstIn(sql).isDefined ||
        "(?is)\\bLIMIT\\s+(\\d+(\\.\\d+)?|\\w+\\s*\\((?:[^()]|\\([^()]*\\))*\\)|\\((?:[^()]|\\([^()]*\\))*\\))\\s*(%|PERCENT)\\s*(OFFSET\\s+.+?)?\\s*;?\\s*$".r.findFirstIn(sql).isDefined ||
        // comment-only blocks AND invisible-unicode-space-only
        // statements (invisible_spaces.test): GraftSql maps the
        // reference's invisible-space set to ' ' and no-ops blanks
        sql.linesIterator.map(_.trim).forall(l =>
          l.isEmpty || l.startsWith("--") ||
            l.forall(c => c.isWhitespace || c == '﻿' || c == ' '))
      if (layerRouted) routed += 1
      else {
        val t =
          try Some(graft.plans.SqlPasses.generatorPass(
            graft.plans.SqlPasses.windowExprBoundsPass(
              graft.plans.SqlPasses.windowExcludePass(
                graft.plans.SqlPasses.emptyGroupingPass(
                  graft.plans.DuckDialect.translate(
                    graft.plans.MacroReg.expand(
                      graft.plans.SqlPasses.nestedJoinPass(sql))))))))
          catch {
            case e: Throwable =>
              val key = Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.next().take(90)
              val (n, ex) = crashes.getOrElse(key, (0, ""))
              crashes(key) = (n + 1,
                if (ex.isEmpty) s"[$file] " + sql.take(160) else ex)
              None
          }
        t.foreach { out =>
          transOk += 1
          try { parser.parsePlan(out); parseOk += 1 }
          catch {
            case e: Throwable
                if Option(e.getMessage).exists(_.contains("INVALID_INLINE_TABLE")) &&
                  "(?is)\\bVALUES\\s*\\(".r.findFirstIn(sql).isDefined =>
              // GraftSql's insertValuesCast / mixedValuesCast retries
              // rewrite exactly this error class at runtime
              // (spec-gated); count as handled
              parseOk += 1
            case e: Throwable =>
              val key = Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.find(_.trim.nonEmpty).getOrElse("").take(90)
              val (n, ex) = parseFails.getOrElse(key, (0, ""))
              parseFails(key) =
                (n + 1, if (ex.isEmpty) s"[$file] " + sql.take(160) else ex)
          }
        }
      }
    }

    val graded = total - routed
    println(s"[sweep] statements: $total  engine-routed verbs: $routed  " +
      s"graded through translate: $graded")
    println(s"[sweep] translate-ok: $transOk " +
      f"(${100.0 * transOk / math.max(graded, 1)}%.1f%%)  spark-parse-ok: $parseOk " +
      f"(${100.0 * parseOk / math.max(graded, 1)}%.1f%%)  " +
      f"handled incl. routed: ${100.0 * (routed + parseOk) / math.max(total, 1)}%.1f%%")
    println("[sweep] top translator crashes:")
    crashes.toSeq.sortBy(-_._2._1).take(400).foreach { case (msg, (n, ex)) =>
      println(f"[sweep]  $n%6d  $msg")
      println(s"[sweep]          e.g. ${ex.replace('\n', ' ')}")
    }
    println("[sweep] top spark-parse failures of translated text:")
    parseFails.toSeq.sortBy(-_._2._1).take(400).foreach { case (msg, (n, ex)) =>
      println(f"[sweep]  $n%6d  $msg")
      println(s"[sweep]          e.g. ${ex.replace('\n', ' ')}")
    }
    spark.stop()
  }
}
