package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plans.DuckDialect

/** The DuckDB-dialect front door: run the reference engine's query
  * text verbatim. `sql` translates the dialect-specific spellings
  * (plans/DuckDialect) and hands the result to Catalyst; the original
  * text is recorded in the session so `current_query()` answers like
  * the reference's.
  */
object GraftSql {
  def translate(text: String): String = DuckDialect.translate(text)

  private val Summarize = """(?is)\s*SUMMARIZE\s+([\w.]+)\s*;?\s*""".r
  private val Describe = """(?is)\s*DESCRIBE\s+([\w.]+)\s*;?\s*""".r
  private val LimitPercent = """(?is)^(.*)\bLIMIT\s+(\d+)\s*(?:%|PERCENT)\s*;?\s*$""".r
  private val Explain = """(?is)^\s*EXPLAIN(\s+ANALYZE)?\s+(.*)$""".r

  def sql(spark: SparkSession, text: String): DataFrame = {
    spark.conf.set("spark.graft.current_query", text)
    text match {
      // EXPLAIN [ANALYZE] <stmt> (reference
      // parser/statement/explain_statement.cpp): same result shape as
      // the reference — (explain_key, explain_value) string rows —
      // with Spark's plan text as the value. Plan rendering is
      // engine-specific by nature (documented; no oracle).
      case Explain(analyze, inner) =>
        return explain(spark, inner, analyze != null)
      // DML verbs route to the copy-on-write engine layer
      // (sources/DmlSql → sources/Dml); plain INSERT INTO stays on
      // Spark's native path below.
      case _ if graft.sources.DmlSql.matches(text) =>
        return graft.sources.DmlSql.run(spark, text)
      // ASOF [LEFT] JOIN statement syntax → the union+window plan
      // (plans/AsofSql → operators/Joins.asofJoin), then the rewritten
      // statement continues through the normal path
      case _ if graft.plans.AsofSql.matches(text) =>
        return sql(spark, graft.plans.AsofSql.rewrite(spark, text))
      case _ =>
    }
    text match {
      // LIMIT n% (reference percentage limit): top fraction of the
      // result — needs the total, so one counting pass then limit
      // (the q65 operator's own plan shape)
      case LimitPercent(inner, pct) =>
        val df = spark.sql(translate(inner))
        val n = df.count()
        return df.limit((n * pct.toLong / 100L).toInt)
      case _ =>
    }
    text match {
      // utility statements the reference treats as top-level verbs:
      // route to the engine's operators instead of Spark's parser
      // (Spark's own DESCRIBE renders Spark type names; the
      // reference's column set and type spellings come from the s16
      // entry's contract). SUMMARIZE <query> still goes through
      // translate+summarize via the match on the inner text.
      case Summarize(table) =>
        graft.operators.Summarize.summarize(spark.table(table))
      case Describe(table) => describe(spark, spark.table(table))
      case _ =>
        translate(text) match {
          // Spark's v1 session catalog has no REPLACE TABLE — the
          // reference's CREATE OR REPLACE is a drop-then-create there
          case CreateOrReplace(name, rest) =>
            spark.sql(s"DROP TABLE IF EXISTS $name")
            spark.sql(s"CREATE TABLE $name $rest")
          case t => spark.sql(t)
        }
    }
  }

  private val CreateOrReplace =
    """(?is)^\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+(`[^`]+`|\S+)\s+(.*)$""".r

  /** Run a multi-statement DuckDB-dialect script (e.g. the reference
    * fork's own sql_files scripts): statements split on `;` outside
    * strings/comments, each executed through the front door; returns
    * the result of every statement in order.
    */
  def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(sql(spark, _))

  /** `;`-splitting that respects '…'/"…" literals and --/block
    * comments (comments are dropped so a trailing `-- note` never
    * hides the next statement).
    */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    val n = script.length
    def flush(): Unit = {
      val s = cur.toString.trim
      if (s.nonEmpty) out += s
      cur.clear()
    }
    while (i < n) {
      val c = script.charAt(i)
      if (c == '-' && i + 1 < n && script.charAt(i + 1) == '-') {
        while (i < n && script.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(script.charAt(i) == '*' && script.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '\'' || c == '"') {
        val q = c
        cur.append(c); i += 1
        var open = true
        while (i < n && open) {
          val ch = script.charAt(i)
          cur.append(ch); i += 1
          if (ch == q) {
            if (i < n && script.charAt(i) == q) { cur.append(q); i += 1 } // '' doubling
            else open = false
          }
        }
      } else if (c == ';') {
        flush(); i += 1
      } else {
        cur.append(c); i += 1
      }
    }
    flush()
    out.result()
  }

  /** EXPLAIN → Spark's formatted plan; EXPLAIN ANALYZE → execute,
    * then render the final (AQE-resolved) physical tree with each
    * node's metric values — the reference's profiler-annotated tree
    * re-expressed with Spark's SQLMetrics.
    */
  def explain(spark: SparkSession, inner: String, analyze: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val df = sql(spark, inner)
    val schema = StructType(Seq(
      StructField("explain_key", StringType, nullable = false),
      StructField("explain_value", StringType, nullable = false)))
    def result(key: String, value: String): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(Row(key, value)), schema)
    if (!analyze) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      result("physical_plan", plan)
    } else {
      val t0 = System.nanoTime()
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val sb = new StringBuilder
      sb.append(f"Total Time: $secs%.3fs   Rows Returned: $rows%d%n")
      def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
        val ms = p.metrics.toSeq.sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
        sb.append("  " * depth).append(p.nodeName)
        if (ms.nonEmpty) sb.append(" [").append(ms).append("]")
        sb.append("\n")
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan, depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      walk(df.queryExecution.executedPlan, 0)
      result("analyzed_plan", sb.toString)
    }
  }

  /** DESCRIBE shaped like the reference's pragma_table_info result
    * (same contract as the oracle-gated s16_describe entry).
    */
  def describe(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(
      Seq("column_name", "column_type", "null", "key", "default", "extra")
        .map(StructField(_, StringType, nullable = true)))
    val rows = df.schema.fields.toSeq.map { f =>
      Row(f.name, graft.queries.DuckTypes.name(f.dataType),
        if (f.nullable) "YES" else "NO", null, null, null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
