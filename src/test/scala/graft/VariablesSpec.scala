package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL session variables (plans/Variables) — the exact script from
  * the reference's test/sql/variables/test_variables.test: SET
  * VARIABLE, overwrite, getvariable, duckdb_variables()/SHOW
  * VARIABLES, RESET VARIABLE, value-from-subquery, single-value
  * errors, unset-reads-NULL.
  */
class VariablesSpec extends AnyFunSuite {
  import TestSession._

  private def one(sql: String): Any = {
    val r = GraftSql.sql(spark, sql).collect()
    if (r.isEmpty) null else r(0).get(0)
  }

  test("SET VARIABLE / GETVARIABLE round-trip, overwrite, reset") {
    graft.plans.Variables.clearAll()
    GraftSql.sql(spark, "SET VARIABLE animal = 'duck'")
    assert(one("SELECT GETVARIABLE('animal')") === "duck")
    GraftSql.sql(spark, "SET VARIABLE animal='bird'")
    assert(one("SELECT GETVARIABLE('animal')") === "bird")
    GraftSql.sql(spark, "RESET VARIABLE animal")
    assert(one("SELECT GETVARIABLE('animal')") === null)
    // variable that was never set reads NULL
    assert(one("SELECT GETVARIABLE('xxx')") === null)
  }

  test("duckdb_variables() and SHOW VARIABLES list (name, value, type)") {
    graft.plans.Variables.clearAll()
    GraftSql.sql(spark, "SET VARIABLE animal = 'bird'")
    val rows = GraftSql.sql(spark, "FROM duckdb_variables()").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ===
      Seq(("animal", "bird", "VARCHAR")))
    val show = GraftSql.sql(spark, "SHOW VARIABLES").collect()
    assert(show.length === 1 && show(0).getString(0) === "animal")
  }

  test("SET VARIABLE from a scalar subquery; lists render as [a, b]") {
    graft.plans.Variables.clearAll()
    try {
      GraftSql.sql(spark, "CREATE OR REPLACE TABLE animal_list(a VARCHAR)")
      GraftSql.sql(spark, "INSERT INTO animal_list VALUES ('duck'), ('goose')")
      GraftSql.sql(spark,
        "SET VARIABLE animals=(SELECT LIST(a) FROM (SELECT a FROM animal_list ORDER BY a) t)")
      val v = GraftSql.sql(spark, "SELECT GETVARIABLE('animals') AS v").collect()(0)
      assert(v.getSeq[String](0).sorted === Seq("duck", "goose"))
      // display rendering matches the reference: [duck, goose]
      val disp = GraftSql.sql(spark, "SHOW VARIABLES").collect()(0).getString(1)
      assert(disp === "[duck, goose]")
    } finally spark.sql("DROP TABLE IF EXISTS animal_list")
  }

  test("more than a single value is the reference's error") {
    val e = intercept[Exception] {
      GraftSql.sql(spark, "SET VARIABLE animals = UNNEST(ARRAY(1,2,3))")
    }
    assert(e.getMessage.contains("single value"))
  }

  test("getvariable folds as a literal usable in any clause") {
    graft.plans.Variables.clearAll()
    GraftSql.sql(spark, "SET VARIABLE k = 2")
    graft.sources.Catalog.registerAll(spark, sfDir)
    val n = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM nation WHERE n_regionkey = getvariable('k')")
      .collect()(0).getLong(0)
    val expect = spark.table("nation").where("n_regionkey = 2").count()
    assert(n === expect)
    // a string literal containing the call text is NOT substituted
    assert(one("SELECT 'getvariable(''k'')'") === "getvariable('k')")
  }
}
