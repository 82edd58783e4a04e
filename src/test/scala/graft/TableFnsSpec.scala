package graft

import org.scalatest.funsuite.AnyFunSuite

/** query()/query_table()/repeat()/repeat_row() table functions
  * (plans/TableFns) — every expectation is the reference's own
  * test corpus: test/sql/catalog/function/query_function.test,
  * macro_query_table.test, test/sql/table_function/
  * test_repeat_function.test, test/sql/function/generic/
  * table_func_varargs.test, test/fuzzer/duckfuzz/repeat_row_null.test.
  */
class TableFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def rows(q: String): Seq[Seq[Any]] =
    GraftSql.sql(spark, q).collect().toSeq.map(_.toSeq)
  private def one(q: String): Seq[Any] = rows(q).head

  test("query('...') runs a constant SELECT as a relation") {
    assert(one("SELECT * FROM query('SELECT 42')") == Seq(42))
    assert(one("FROM query('SELECT 42 AS a')") == Seq(42))
    assert(one("FROM query('SELECT 10 + 32;')") == Seq(42))
    assert(one("FROM query('SELECT abs(-42)')") == Seq(42))
    assert(one("SELECT * FROM query('SELECT * FROM (SELECT 1 + 2)')") ==
      Seq(3))
    assert(one("FROM query('SELECT 1, 2, 3')") == Seq(1, 2, 3))
    // trailing semicolons + line comments inside the text
    assert(one("FROM query('SELECT 42;;;--- hello;')") == Seq(42))
    assert(one("SELECT * FROM query('SELECT ''hello''')") == Seq("hello"))
    // FROM-first inner statement; WITH inner statement
    spark.range(3).toDF("i").createOrReplaceTempView("qf_t")
    assert(rows("SELECT * FROM query('FROM qf_t') ORDER BY i") ==
      Seq(Seq(0L), Seq(1L), Seq(2L)))
    assert(one("SELECT * FROM query('WITH a(i) AS (SELECT 1) " +
      "SELECT a1.i AS i1, a2.i AS i2 FROM a AS a1, a AS a2')") == Seq(1, 1))
  }

  test("query() rejects non-SELECT / multi-statement / non-constant input") {
    for (bad <- Seq("SELECT * FROM query(NULL)", "SELECT * FROM query(' ')",
        "SELECT * FROM query('')",
        "SELECT * FROM query('SELECT 1; SELECT 2')",
        "SELECT * FROM query('CREATE TABLE tbl (a INT)')"))
      assert(intercept[Exception](rows(bad))
        .getMessage.contains("single SELECT"), bad)
  }

  test("query_table unions named tables, by position or by name") {
    GraftSql.runScript(spark,
      """CREATE OR REPLACE TEMP VIEW qt1 AS SELECT 1 a, 2 b, 3 c
        | UNION ALL SELECT 4, 5, 6;
        |CREATE OR REPLACE TEMP VIEW qt2 AS SELECT 9 a, 8 b, 7 c;
        |CREATE OR REPLACE TEMP VIEW qt_int AS SELECT 42 x;
        |CREATE OR REPLACE TEMP VIEW qt_str AS SELECT 'duckdb' s
        |""".stripMargin)
    assert(one("FROM query_table('qt_int')") == Seq(42))
    assert(one("FROM query_table(['qt_int'])") == Seq(42))
    assert(one("FROM query_table(qt_int)") == Seq(42))
    assert(one("FROM query_table(\"qt_int\")") == Seq(42))
    assert(rows("SELECT * FROM query_table([qt1, qt2]) ORDER BY a") ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(9, 8, 7)))
    // positional union of unlike columns keeps the first schema
    assert(rows("FROM query_table(['qt_int', 'qt_str'], false)")
      .map(_.head).toSet == Set("42", "duckdb"))
    // by_name=true → union by name, NULL fill for missing columns
    val byName = rows(
      "SELECT * FROM query_table([qt_int, qt_str], true) ORDER BY x NULLS LAST")
    assert(byName == Seq(Seq(42, null), Seq(null, "duckdb")))
    // the macro idiom passes the name through a ::VARCHAR cast
    GraftSql.sql(spark, "CREATE OR REPLACE MACRO min_from_tbl(tbl, col) AS " +
      "(SELECT min(col) FROM query_table(tbl::VARCHAR))")
    assert(one("SELECT min_from_tbl(qt1, a) AS m") == Seq(1))
  }

  test("repeat(value, count) as a relation") {
    assert(rows("SELECT * FROM repeat(0, 3)") == Seq(Seq(0), Seq(0), Seq(0)))
    assert(rows("SELECT * FROM repeat(NULL, 2)") == Seq(Seq(null), Seq(null)))
    assert(rows("SELECT * FROM repeat('hello', 2)") ==
      Seq(Seq("hello"), Seq("hello")))
    assert(rows("SELECT * FROM repeat(DATE '1992-01-01', 2)").map(_.head)
      .forall(_.toString == "1992-01-01"))
    assert(GraftSql.sql(spark, "SELECT * FROM repeat(1, 10000)").count() ==
      10000L)
    // the output column is named by the value's literal text
    assert(GraftSql.sql(spark, "SELECT * FROM repeat('hello', 2)")
      .columns.toSeq == Seq("hello"))
    // scalar repeat in a select list is untouched
    assert(one("SELECT repeat('ab', 3) AS r") == Seq("ababab"))
    assert(intercept[Exception](
      rows("SELECT * FROM repeat(INTERVAL '30 days', NULL)"))
      .getMessage.contains("cannot be NULL"))
  }

  test("repeat_row(v1, ..., num_rows=N)") {
    assert(rows("SELECT * FROM repeat_row(1, 2, 'foo', num_rows=3)") ==
      Seq.fill(3)(Seq(1, 2, "foo")))
    assert(GraftSql.sql(spark,
        "SELECT * FROM repeat_row(1, 2, 'foo', num_rows=3)")
      .columns.toSeq == Seq("column0", "column1", "column2"))
    assert(rows("FROM repeat_row(NULL, num_rows=3)") ==
      Seq.fill(3)(Seq(null)))
    assert(intercept[Exception](rows("FROM repeat_row(NULL)"))
      .getMessage.contains("num_rows"))
    assert(intercept[Exception](rows("FROM repeat_row(num_rows=3)"))
      .getMessage.contains("at least one column"))
  }
}
