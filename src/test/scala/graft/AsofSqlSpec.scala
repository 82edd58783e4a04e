package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ASOF [LEFT] JOIN statement route (plans/AsofSql →
  * operators/Joins.asofJoin): all four reference inequalities ×
  * inner/left, every result pinned by running the identical text in
  * DuckDB 1.0.0 (bind_joinref's ASOF validation; `>=`/`>` match
  * backward, `<=`/`<` forward, strictness decides whether equal
  * times match).
  */
class AsofSqlSpec extends AnyFunSuite {
  import TestSession._

  private lazy val fixture: Unit = {
    spark.sql(
      """SELECT * FROM VALUES
        | (1, TIMESTAMP '2024-01-01 10:00:00', 1),
        | (1, TIMESTAMP '2024-01-01 11:00:00', 2),
        | (2, TIMESTAMP '2024-01-01 10:30:00', 3),
        | (3, TIMESTAMP '2024-01-01 09:00:00', 4) AS l(k, t, lid)""".stripMargin)
      .createOrReplaceTempView("asof_l")
    spark.sql(
      """SELECT * FROM VALUES
        | (1, TIMESTAMP '2024-01-01 09:30:00', 10),
        | (1, TIMESTAMP '2024-01-01 10:00:00', 11),
        | (1, TIMESTAMP '2024-01-01 10:45:00', 12),
        | (2, TIMESTAMP '2024-01-01 11:00:00', 13) AS r(rk, rt, rid)""".stripMargin)
      .createOrReplaceTempView("asof_r")
  }

  private def run(op: String, left: Boolean): Seq[(Int, Any)] = {
    fixture
    val join = if (left) "ASOF LEFT JOIN" else "ASOF JOIN"
    GraftSql.sql(spark,
      s"SELECT lid, rid FROM asof_l l $join asof_r r ON l.k = r.rk AND l.t $op r.rt ORDER BY lid")
      .collect().map(r => (r.getInt(0), r.get(1))).toSeq
  }

  test(">= backward inclusive (DuckDB-pinned)") {
    assert(run(">=", left = false) === Seq((1, 11), (2, 12)))
    assert(run(">=", left = true) === Seq((1, 11), (2, 12), (3, null), (4, null)))
  }

  test("> backward strict") {
    assert(run(">", left = false) === Seq((1, 10), (2, 12)))
    assert(run(">", left = true) === Seq((1, 10), (2, 12), (3, null), (4, null)))
  }

  test("<= forward inclusive") {
    assert(run("<=", left = false) === Seq((1, 11), (3, 13)))
    assert(run("<=", left = true) === Seq((1, 11), (2, null), (3, 13), (4, null)))
  }

  test("< forward strict") {
    assert(run("<", left = false) === Seq((1, 12), (3, 13)))
    assert(run("<", left = true) === Seq((1, 12), (2, null), (3, 13), (4, null)))
  }

  test("flipped spelling (right expr on the left of the inequality) normalizes") {
    fixture
    val got = GraftSql.sql(spark,
      "SELECT lid, rid FROM asof_l l ASOF JOIN asof_r r ON r.rk = l.k AND r.rt <= l.t ORDER BY lid")
      .collect().map(r => (r.getInt(0), r.get(1))).toSeq
    assert(got === Seq((1, 11), (2, 12)))
  }

  test("r13: ASOF ANTI JOIN returns probe rows with no match (DuckDB-pinned)") {
    // DuckDB 1.0: (VALUES (1),(5),(12)) ASOF ANTI (VALUES (3),(10)) on
    // >= leaves only 1 (5 matches 3, 12 matches 10)
    val got = GraftSql.sql(spark,
      "SELECT p.begin FROM (VALUES (1),(5),(12)) p(begin) ASOF ANTI JOIN " +
      "(VALUES (3),(10)) e(begin) ON p.begin >= e.begin ORDER BY 1")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1))
  }

  test("r13: parenthesized-relation alias does not shadow same-named views") {
    fixture
    // `(SELECT …) trades13 ASOF JOIN …` must not re-point the session
    // name `trades13` at the subquery frame for later statements
    spark.sql("SELECT 99 AS marker").createOrReplaceTempView("trades13")
    val out = GraftSql.sql(spark,
      "SELECT lid, rid FROM (SELECT * FROM asof_l) trades13 ASOF JOIN asof_r r " +
      "ON trades13.k = r.rk AND trades13.t >= r.rt ORDER BY lid")
      .collect().map(r => (r.getInt(0), r.get(1))).toSeq
    assert(out === Seq((1, 11), (2, 12)))
    assert(spark.table("trades13").columns.toSeq == Seq("marker"))
    spark.catalog.dropTempView("trades13")
  }

  test("ASOF RIGHT JOIN: inner match set right-outer-extended (DuckDB-pinned)") {
    fixture
    // DuckDB 1.0: [(NULL,10), (1,11), (2,12), (NULL,13)] — the inner
    // pairs plus each unmatched right row once with NULL left columns
    val out = GraftSql.sql(spark,
      "SELECT lid, rid FROM asof_l l ASOF RIGHT JOIN asof_r r ON l.k = r.rk AND l.t >= r.rt ORDER BY rid")
      .collect().map(r => (r.get(0), r.getInt(1))).toSeq
    assert(out === Seq((null, 10), (1, 11), (2, 12), (null, 13)))
  }
}
