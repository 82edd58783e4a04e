package graft

import org.scalatest.funsuite.AnyFunSuite

/** Generated columns (reference test/sql/generated_columns/virtual +
  * stored): CREATE TABLE with `col AS (expr)`, INSERT targeting only
  * physical columns, UPDATE recomputing the generated value from the
  * post-update base, and the declared column order surviving.
  * Expected values are the reference test files' own outputs
  * (partition.test, update.test).
  */
class GeneratedColumnsSpec extends AnyFunSuite {
  import TestSession._

  private def inScratch[T](tables: String*)(body: => T): T = {
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try body
    finally tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("virtual generated column computes on insert; declared order kept") {
    inScratch("unit") {
      GraftSql.runScript(spark,
        """CREATE TABLE unit (
          |  price INTEGER,
          |  amount_sold INTEGER,
          |  name VARCHAR,
          |  total_profit AS (price * amount_sold)
          |);
          |INSERT INTO unit VALUES (5, 4, 'Soda can');
          |INSERT INTO unit VALUES (5, 8, 'Mars bar')""".stripMargin)
      val df = spark.table("unit")
      assert(df.columns.toSeq === Seq("price", "amount_sold", "name", "total_profit"))
      val rows = df.orderBy("amount_sold").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3))).toSeq
      assert(rows === Seq((5, 4, "Soda can", 20), (5, 8, "Mars bar", 40)))
    }
  }

  test("generated column leading the declared list; typed + STORED forms") {
    inScratch("tbl2") {
      GraftSql.runScript(spark,
        """CREATE TABLE tbl2 (
          |  doubled BIGINT AS (price * 2) STORED,
          |  price INTEGER
          |);
          |INSERT INTO tbl2 VALUES (7)""".stripMargin)
      val r = spark.table("tbl2").collect()(0)
      assert(spark.table("tbl2").columns.toSeq === Seq("doubled", "price"))
      assert(r.getLong(0) === 14L && r.getInt(1) === 7)
    }
  }

  test("UPDATE of a base column recomputes the generated value") {
    inScratch("gup") {
      GraftSql.runScript(spark,
        """CREATE TABLE gup (price INTEGER, total AS (price * 10));
          |INSERT INTO gup VALUES (3), (4);
          |UPDATE gup SET price = price + 1 WHERE price = 3""".stripMargin)
      val rows = spark.table("gup").orderBy("price").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows === Seq((4, 40), (4, 40)))
    }
  }

  test("SET on a generated column and INSERT into one are rejected") {
    inScratch("gerr") {
      GraftSql.runScript(spark,
        """CREATE TABLE gerr (price INTEGER, total AS (price * 10));
          |INSERT INTO gerr VALUES (1)""".stripMargin)
      val e1 = intercept[Exception] {
        GraftSql.sql(spark, "UPDATE gerr SET total = 99")
      }
      assert(e1.getMessage.contains("generated"))
      val e2 = intercept[Exception] {
        GraftSql.sql(spark, "INSERT INTO gerr (total) VALUES (5)")
      }
      assert(e2.getMessage.contains("generated"))
    }
  }

  test("column DEFAULT fills unnamed INSERT columns (dialect + native)") {
    inScratch("tdef") {
      GraftSql.runScript(spark,
        """CREATE TABLE tdef (a INTEGER DEFAULT -1, b INTEGER DEFAULT -2, c INTEGER DEFAULT -3);
          |INSERT INTO tdef (a) VALUES (10)""".stripMargin)
      val r = spark.table("tdef").collect()(0)
      assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((10, -2, -3)))
    }
  }
}
