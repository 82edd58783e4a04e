package graft.sources

import org.apache.spark.sql.SparkSession

/** ATTACH / DETACH analog (reference: src/parser/statement/
  * attach_statement.cpp + storage attach — `ATTACH 'file.db' AS name`
  * mounts a second catalog; queries address it as name.table).
  *
  * The Spark-native mapping: a directory of parquet tables mounts as
  * a DATABASE in the session catalog — external tables pointing at
  * the files (no copy, no scan at attach time; Spark's catalog is
  * the MVCC-free analog of the reference's attached read-only DB).
  * Cross-database joins then work exactly like the reference's
  * `SELECT … FROM db1.t JOIN db2.u` — and at cluster scale this is
  * a metastore registration, O(#tables), independent of data size.
  *
  * `events` needs the Catalog nanos truncation (TIMESTAMP(NANOS)
  * parquet), which a bare external table cannot express — it mounts
  * as `events_raw` plus a persistent VIEW `events` applying the same
  * µs truncation, so attached reads ≡ Catalog.table reads.
  */
object Attach {

  def attach(spark: SparkSession, name: String, dir: String): Unit = {
    detach(spark, name)
    spark.sql(s"CREATE DATABASE `$name`")
    Catalog.tableNames.foreach { t =>
      if (t == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.sql(
          s"CREATE TABLE `$name`.events_raw USING parquet LOCATION '$dir/events.parquet'")
        // TIMESTAMP(NANOS) parquet mounts as raw longs (legacy mode) and
        // needs the µs truncation; µs-typed data passes through — same
        // branch Catalog.events takes, so attached reads ≡ Catalog reads.
        val tsIsNanos = spark.table(s"`$name`.events_raw").schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
        val tsExpr =
          if (tsIsNanos) "timestamp_micros(ts div 1000) AS ts" else "ts"
        spark.sql(
          s"""CREATE VIEW `$name`.events AS
             |SELECT event_id, $tsExpr,
             |       user_id, event_type, value, props
             |FROM `$name`.events_raw""".stripMargin)
      } else {
        spark.sql(s"CREATE TABLE `$name`.`$t` USING parquet LOCATION '$dir/$t.parquet'")
      }
    }
  }

  def detach(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")

  def isAttached(spark: SparkSession, name: String): Boolean =
    spark.catalog.databaseExists(name)
}
