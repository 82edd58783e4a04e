package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage item: a Spark implementation + (when SQL-expressible)
  * the DuckDB oracle SQL that must hash-match it. Column aliases are
  * kept identical on both sides by construction.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def run(spark: SparkSession, sfDir: String): DataFrame = fn(spark, sfDir)
}

object QDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
