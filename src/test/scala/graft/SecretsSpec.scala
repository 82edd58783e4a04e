package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE/DROP SECRET + duckdb_secrets() (plans/Secrets) and
  * COPY FROM DATABASE (StatementSurface.copyDatabase) — registry
  * semantics pinned against the reference's
  * test/sql/secrets/create_secret_defaults.test and
  * test/sql/copy_database.
  */
class SecretsSpec extends AnyFunSuite {
  import TestSession._

  test("CREATE SECRET defaults: __default_<type> name, config provider, type scopes") {
    graft.plans.Secrets.clearAll()
    GraftSql.sql(spark,
      "CREATE SECRET ( TYPE S3, KEY_ID 'my_key', SECRET 'my_secret' )")
    val r = GraftSql.sql(spark,
      "SELECT name, provider, type, scope FROM duckdb_secrets()").collect()(0)
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ===
      (("__default_s3", "config", "s3", "[s3://, s3n://, s3a://]")))
    // second type lists alongside, ordered by name
    GraftSql.sql(spark,
      "CREATE SECRET ( TYPE R2, KEY_ID 'k', SECRET 's', ACCOUNT_ID 'a' )")
    val all = GraftSql.sql(spark,
      "SELECT name, persistent, storage FROM duckdb_secrets() ORDER BY name").collect()
    assert(all.map(_.getString(0)).toSeq === Seq("__default_r2", "__default_s3"))
    assert(all.forall(r2 => r2.getString(1) == "0" && r2.getString(2) == "memory"))
  }

  test("named + scoped secret configures per-bucket s3a conf; duplicate errors; DROP removes") {
    graft.plans.Secrets.clearAll()
    GraftSql.sql(spark,
      "CREATE SECRET s1 ( TYPE S3, SCOPE 's3://my-bucket/data', KEY_ID 'AK', SECRET 'SK' )")
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.bucket.my-bucket.access.key") === "AK")
    assert(conf.get("fs.s3a.bucket.my-bucket.secret.key") === "SK")
    intercept[Exception] {
      GraftSql.sql(spark, "CREATE SECRET s1 ( TYPE S3, KEY_ID 'x', SECRET 'y' )")
    }
    // IF NOT EXISTS and OR REPLACE both accept
    GraftSql.sql(spark, "CREATE SECRET IF NOT EXISTS s1 ( TYPE S3, KEY_ID 'x', SECRET 'y' )")
    GraftSql.sql(spark, "CREATE OR REPLACE SECRET s1 ( TYPE S3, KEY_ID 'x2', SECRET 'y2' )")
    GraftSql.sql(spark, "DROP SECRET s1")
    assert(GraftSql.sql(spark, "SELECT * FROM duckdb_secrets()").collect().isEmpty)
    intercept[Exception] { GraftSql.sql(spark, "DROP SECRET s1") }
    GraftSql.sql(spark, "DROP SECRET IF EXISTS s1") // no error
  }

  test("COPY FROM DATABASE copies tables (DATA) or empty schemas (SCHEMA)") {
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS cdb_src")
      spark.sql("DROP TABLE IF EXISTS cdb_src.t1")
      spark.sql("DROP TABLE IF EXISTS cdb_src.t2")
      spark.sql("CREATE TABLE cdb_src.t1 AS SELECT 1 AS a UNION ALL SELECT 2")
      spark.sql("CREATE TABLE cdb_src.t2 AS SELECT 'x' AS s")
      val n = GraftSql.sql(spark, "COPY FROM DATABASE cdb_src TO cdb_dst")
        .collect()(0).getLong(0)
      assert(n === 2L)
      assert(spark.table("cdb_dst.t1").count() === 2L)
      assert(spark.table("cdb_dst.t2").collect()(0).getString(0) === "x")
      val n2 = GraftSql.sql(spark, "COPY FROM DATABASE cdb_src TO cdb_schema (SCHEMA)")
        .collect()(0).getLong(0)
      assert(n2 === 2L)
      assert(spark.table("cdb_schema.t1").count() === 0L)
      assert(spark.table("cdb_schema.t1").columns.toSeq === Seq("a"))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS cdb_src CASCADE")
      spark.sql("DROP DATABASE IF EXISTS cdb_dst CASCADE")
      spark.sql("DROP DATABASE IF EXISTS cdb_schema CASCADE")
    }
  }
}
