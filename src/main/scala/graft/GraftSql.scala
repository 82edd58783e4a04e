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

  def sql(spark: SparkSession, text: String): DataFrame = {
    spark.conf.set("spark.graft.current_query", text)
    spark.sql(translate(text))
  }
}
