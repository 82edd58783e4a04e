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

/** The reference engine's names for Spark schema types — what
  * typeof()/DESCRIBE render. Shared by the introspection entries
  * (f51 typeof, s16 DESCRIBE).
  */
object DuckTypes {
  import org.apache.spark.sql.types._

  def name(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case DateType => "DATE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case ArrayType(e, _) => s"${name(e)}[]"
    case other => other.sql
  }
}
