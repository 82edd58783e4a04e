package graft

import org.scalatest.funsuite.AnyFunSuite

/** The remaining reference statement verbs through the front door
  * (plans/StatementSurface): SET/RESET, PRAGMA, CALL, VACUUM,
  * PREPARE/EXECUTE/DEALLOCATE, COPY TO/FROM, ATTACH/DETACH.
  */
class StatementSurfaceSpec extends AnyFunSuite {
  import TestSession._

  test("SET / current_setting round-trip, RESET clears") {
    GraftSql.sql(spark, "SET memory_limit = '2GB'")
    assert(spark.sql("SELECT current_setting('memory_limit')")
      .collect()(0).getString(0) === "2GB")
    GraftSql.sql(spark, "RESET memory_limit")
    // timezone maps to the real Spark session conf
    GraftSql.sql(spark, "SET timezone = 'UTC'")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
  }

  test("PRAGMA table_info / show_tables / version; CALL form") {
    graft.sources.Catalog.registerAll(spark, sfDir)
    val ti = GraftSql.sql(spark, "PRAGMA table_info('nation')").collect()
    assert(ti.map(_.getString(0)).toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
    val ti2 = GraftSql.sql(spark, "CALL pragma_table_info('nation')").collect()
    assert(ti2.length === 3)
    assert(GraftSql.sql(spark, "PRAGMA show_tables").collect()
      .map(_.getString(0)).contains("nation"))
    assert(GraftSql.sql(spark, "PRAGMA version").columns.toSeq ===
      Seq("library_version", "source_id"))
    GraftSql.sql(spark, "PRAGMA memory_limit='1GB'") // assign form
    intercept[Exception] { GraftSql.sql(spark, "PRAGMA no_such_report('x')") }
  }

  test("PREPARE / EXECUTE with $n and ? placeholders; DEALLOCATE") {
    graft.sources.Catalog.registerAll(spark, sfDir)
    GraftSql.sql(spark,
      "PREPARE topn AS SELECT n_name FROM nation WHERE n_regionkey = $1 ORDER BY n_name LIMIT $2")
    val r = GraftSql.sql(spark, "EXECUTE topn(1, 2)").collect().map(_.getString(0))
    assert(r.length === 2)
    GraftSql.sql(spark, "PREPARE q2 AS SELECT COUNT(*) AS n FROM nation WHERE n_regionkey = ?")
    assert(GraftSql.sql(spark, "EXECUTE q2(1)").collect()(0).getLong(0) === 5L)
    GraftSql.sql(spark, "DEALLOCATE topn")
    intercept[Exception] { GraftSql.sql(spark, "EXECUTE topn(1, 2)") }
  }

  test("COPY TO writes one file; COPY FROM appends into a table") {
    graft.sources.Catalog.registerAll(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_copy").toString
    val out = s"$dir/nation.csv"
    val c = GraftSql.sql(spark, s"COPY nation TO '$out' (HEADER)").collect()(0).getLong(0)
    assert(c === 25L)
    assert(new java.io.File(out).isFile) // ONE file, reference-style
    // round-trip into a managed table
    spark.sql("CREATE DATABASE IF NOT EXISTS stmtspec")
    spark.sql("USE stmtspec")
    spark.sql("DROP TABLE IF EXISTS nat2")
    try {
      GraftSql.sql(spark,
        "CREATE TABLE nat2 (n_nationkey INTEGER, n_name VARCHAR, n_regionkey INTEGER)")
      val in = GraftSql.sql(spark, s"COPY nat2 FROM '$out' (HEADER)").collect()(0).getLong(0)
      assert(in === 25L)
      assert(spark.table("nat2").count() === 25L)
      // COPY (SELECT ...) TO
      val out2 = s"$dir/small.parquet"
      GraftSql.sql(spark,
        s"COPY (SELECT n_name FROM nat2 WHERE n_regionkey = 0) TO '$out2' (FORMAT PARQUET)")
      assert(spark.read.parquet(out2).count() === 5L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS nat2")
      spark.sql("USE default")
    }
  }

  test("ATTACH a parquet directory as a database; DETACH removes it") {
    GraftSql.sql(spark, s"ATTACH '$sfDir' AS att9")
    assert(spark.sql("SELECT COUNT(*) FROM att9.nation").collect()(0).getLong(0) === 25L)
    GraftSql.sql(spark, "DETACH att9")
    assert(!spark.catalog.databaseExists("att9"))
    intercept[Exception] { GraftSql.sql(spark, "ATTACH 'x.duckdb' AS nope") }
  }

  test("ALTER TABLE ADD/DROP/RENAME COLUMN rewrite the table; RENAME TO stays native") {
    spark.sql("CREATE DATABASE IF NOT EXISTS stmtspec")
    spark.sql("USE stmtspec")
    Seq("alt", "alt2", "alt__alter_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      GraftSql.sql(spark, "CREATE TABLE alt (k INTEGER, v VARCHAR)")
      GraftSql.sql(spark, "INSERT INTO alt VALUES (1, 'a'), (2, 'b')")
      GraftSql.sql(spark, "ALTER TABLE alt ADD COLUMN score UBIGINT DEFAULT 7")
      assert(spark.table("alt").columns.toSeq === Seq("k", "v", "score"))
      assert(spark.table("alt").selectExpr("CAST(score AS INT)")
        .collect().map(_.getInt(0)).toSeq === Seq(7, 7))
      GraftSql.sql(spark, "ALTER TABLE alt RENAME COLUMN v TO label")
      assert(spark.table("alt").columns.toSeq === Seq("k", "label", "score"))
      GraftSql.sql(spark, "ALTER TABLE alt DROP COLUMN score")
      assert(spark.table("alt").columns.toSeq === Seq("k", "label"))
      GraftSql.sql(spark, "ALTER TABLE alt RENAME TO alt2") // native path
      assert(spark.table("alt2").count() === 2L)
    } finally {
      Seq("alt", "alt2", "alt__alter_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql("USE default")
    }
  }

  test("statement INTERACTIONS: macro inside prepared DML, ALTER mid-script, txn, upsert — end state pinned vs DuckDB") {
    spark.sql("CREATE DATABASE IF NOT EXISTS stmtspec")
    spark.sql("USE stmtspec")
    Seq("kit", "kit__alter_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      GraftSql.runScript(spark,
        """CREATE OR REPLACE TABLE kit (id INTEGER PRIMARY KEY, amt DOUBLE);
          |INSERT INTO kit VALUES (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0);
          |CREATE OR REPLACE MACRO bump(x) AS x + 0.5;
          |ALTER TABLE kit ADD COLUMN tag VARCHAR DEFAULT 'base';
          |PREPARE pay AS UPDATE kit SET amt = bump(amt) WHERE id = $1;
          |EXECUTE pay(2);
          |EXECUTE pay(4);
          |BEGIN TRANSACTION;
          |DELETE FROM kit WHERE id = 1;
          |ROLLBACK;
          |INSERT INTO kit VALUES (2, 99.0, 'dup'), (5, 50.0, 'new') ON CONFLICT (id) DO UPDATE SET tag = excluded.tag;
          |ALTER TABLE kit RENAME COLUMN amt TO amount""".stripMargin)
      val got = spark.sql("SELECT id, amount, tag FROM kit ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq
      // the identical script's end state in DuckDB 1.0.0
      assert(got === Seq(
        (1, 10.0, "base"), (2, 20.5, "dup"), (3, 30.0, "base"),
        (4, 40.5, "base"), (5, 50.0, "new")))
    } finally {
      if (graft.sources.Txn.isActive) graft.sources.Txn.rollback(spark)
      Seq("kit", "kit__alter_build").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql("USE default")
    }
  }

  test("VACUUM compacts a fragmented managed table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS stmtspec")
    spark.sql("USE stmtspec")
    spark.sql("DROP TABLE IF EXISTS frag")
    try {
      spark.range(1000).selectExpr("id").repartition(20).write.saveAsTable("frag")
      GraftSql.sql(spark, "VACUUM frag")
      assert(spark.table("frag").count() === 1000L)
      val loc = new java.io.File(spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier("frag"))
        .location)
      val parts = loc.listFiles.count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(parts < 20, s"expected compaction, still $parts files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS frag")
      spark.sql("USE default")
    }
  }

  test("EXECUTE $n substitution: 10+ params, $n in string literals untouched") {
    GraftSql.sql(spark,
      "PREPARE p10 AS SELECT $10 AS a, $1 AS b, 'costs $2 exactly' AS c")
    val r = GraftSql.sql(spark, "EXECUTE p10(1,2,3,4,5,6,7,8,9,42)").collect()(0)
    // $10 must bind arg 10 (not arg1 followed by '0'), and the $2
    // inside the string literal must survive verbatim
    assert(r.get(0).toString === "42")
    assert(r.get(1).toString === "1")
    assert(r.getString(2) === "costs $2 exactly")
    GraftSql.sql(spark, "DEALLOCATE p10")
  }

  test("CREATE OR REPLACE TABLE t AS SELECT ... FROM t stages before dropping") {
    try {
      GraftSql.sql(spark, "CREATE OR REPLACE TABLE corself AS SELECT 1 AS x")
      // self-referencing replace: the old contents must survive until
      // the new table is fully materialized
      GraftSql.sql(spark,
        "CREATE OR REPLACE TABLE corself AS SELECT x + 1 AS x FROM corself")
      assert(spark.table("corself").collect()(0).get(0).toString === "2")
    } finally spark.sql("DROP TABLE IF EXISTS corself")
  }

  test("UNION BY NAME: CTAS prefix and trailing ORDER BY/LIMIT bind to the whole setop") {
    try {
      GraftSql.sql(spark,
        "CREATE OR REPLACE TABLE ubn_t AS SELECT 1 AS a UNION ALL BY NAME SELECT 2 AS b")
      // both arms must land in the table (a CTAS prefix must not be
      // executed as part of the left arm alone)
      assert(spark.table("ubn_t").count() === 2L)
      assert(spark.table("ubn_t").columns.toSeq === Seq("a", "b"))
    } finally spark.sql("DROP TABLE IF EXISTS ubn_t")
    // ORDER BY + LIMIT after the right arm applies to the UNION result
    val r = GraftSql.sql(spark,
      "SELECT 3 AS v UNION ALL BY NAME SELECT 1 AS v UNION ALL BY NAME SELECT 2 AS v ORDER BY v DESC LIMIT 2")
      .collect().map(_.get(0).toString).toSeq
    assert(r === Seq("3", "2"))
  }
}
