package graft

import org.scalatest.funsuite.AnyFunSuite

/** r10 dialect-corner burn-down — every expectation is DuckDB output
  * for the same text (pinned this session): INSERT … DEFAULT VALUES
  * (test_default_values.test), JSON `->` with integer array indices
  * (json issue13948), ordered-set quantiles (`quantile_cont(x, q
  * ORDER BY …)`, test_quantile_cont.test:138), and BC dates
  * (bc_timestamp.test family).
  */
class DialectCornersSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def one(q: String): Seq[Any] =
    GraftSql.sql(spark, q).collect()(0).toSeq

  test("INSERT ... DEFAULT VALUES fills recorded defaults (NULL when none)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS cornersdb")
    spark.sql("USE cornersdb")
    try {
      GraftSql.runScript(spark,
        """CREATE OR REPLACE TABLE dv (i INT DEFAULT 1, j INT DEFAULT 2, k INT);
          |INSERT INTO dv DEFAULT VALUES""".stripMargin)
      assert(one("SELECT i, j, k FROM dv") == Seq(1, 2, null))
      // naming target columns with DEFAULT VALUES is a parse error
      // in the reference too
      intercept[Exception] {
        GraftSql.sql(spark, "INSERT INTO dv(i) DEFAULT VALUES")
      }
      // RETURNING over the defaulted row (test_default_values.test)
      val r = GraftSql.sql(spark,
        "INSERT INTO dv DEFAULT VALUES RETURNING i, j").collect()(0)
      assert(r.getInt(0) == 1 && r.getInt(1) == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dv")
      spark.sql("USE default")
    }
  }

  test("JSON -> with integer array index, chained (issue13948)") {
    assert(one("SELECT '[1, 2, 3]' -> 0 AS a, '[[1,2],[3]]' -> 1 -> 0 AS b") ==
      Seq("1", "3"))
    // lambdas with numeric bodies are untouched
    assert(one("SELECT transform(array(1,2), x -> 0) AS t") ==
      Seq(Seq(0, 0)))
    // ...including MULTI-parameter lambdas (r10 ADVICE: `(a, b) -> 0`
    // must not be read as get_json_object((a, b), '$[0]'))
    assert(one("SELECT list_reduce([1,2,3], (a, b) -> 0) AS r") == Seq(0))
    assert(one("SELECT aggregate(array(1,2,3), 0, (acc, x) -> acc + x) AS s") == Seq(6))
  }

  test("big temporal literal with a time component CAST to DATE stays a DATE") {
    // reference: CAST('10000-01-01 10:00:00' AS DATE) = DATE
    // '10000-01-01' (time truncated), not a TIMESTAMP
    val df = GraftSql.sql(spark, "SELECT CAST('10000-01-01 10:00:00' AS DATE) AS d")
    assert(df.schema.fields(0).dataType ==
      org.apache.spark.sql.types.DateType)
    assert(df.collect()(0).getDate(0).toLocalDate ==
      java.time.LocalDate.of(10000, 1, 1))
  }

  test("ordered-set quantiles: quantile_cont/disc(x, q ORDER BY ...) — DuckDB-pinned") {
    assert(one("SELECT quantile_cont(x, 0.8 ORDER BY x DESC) FROM (VALUES (2), (1)) _(x)") ==
      Seq(1.2))
    assert(one("SELECT quantile_disc(x, 0.8 ORDER BY x DESC) FROM (SELECT explode(sequence(1, 10)) AS x)") ==
      Seq(3))
    val multi = GraftSql.sql(spark,
      "SELECT g, quantile_cont(x, 0.25 ORDER BY x DESC) AS q FROM " +
        "(SELECT id AS x, id % 2 AS g FROM range(10)) GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(multi == Seq((0L, 6.0), (1L, 7.0)))
  }

  test("BC dates: astronomical year mapping (year N BC = -(N-1))") {
    assert(one("SELECT year('0044-03-15 (BC)'::DATE) AS y, " +
      "('0044-03-15 (BC)'::DATE < '0001-01-01'::DATE) AS lt") == Seq(-43, true))
    assert(one("SELECT year('0001-01-01 (BC)'::DATE) AS y") == Seq(0))
  }
}
