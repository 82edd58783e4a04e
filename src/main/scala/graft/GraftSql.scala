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

  def sql(spark: SparkSession, text: String): DataFrame = {
    spark.conf.set("spark.graft.current_query", text)
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
      case _ => spark.sql(translate(text))
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
