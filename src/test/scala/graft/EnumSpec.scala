package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** ENUM dictionary mapping (F59): every pin below is VERBATIM DuckDB
  * 1.0.0 output for the same statements (captured 2026-08-14):
  *
  *   CREATE TYPE mood AS ENUM ('sad','ok','happy');
  *   enum_first(NULL::mood) = 'sad'     enum_last(NULL::mood) = 'happy'
  *   enum_code('ok'::mood) = 1          enum_range(NULL::mood) = [sad, ok, happy]
  *   enum_range_boundary('sad'::mood,'ok'::mood) = [sad, ok]
  *   enum_range_boundary(NULL,'ok'::mood) = [sad, ok]
  *   enum_range_boundary('ok'::mood,NULL) = [ok, happy]
  *   ORDER BY x::mood → definition order (sad, ok, happy)
  *   'angry'::mood → Conversion Error    TRY_CAST('angry' AS mood) → NULL
  */
class EnumSpec extends AnyFunSuite {
  import TestSession._

  private def sql1(q: String): Any =
    GraftSql.sql(spark, q).collect()(0).get(0)

  private def withMood[A](body: => A): A = {
    GraftSql.sql(spark, "CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
    try body finally GraftSql.sql(spark, "DROP TYPE mood")
  }

  test("enum_first / enum_last / enum_code fold to the DuckDB values") {
    withMood {
      assert(sql1("SELECT enum_first(NULL::mood)") == "sad")
      assert(sql1("SELECT enum_last(NULL::mood)") == "happy")
      assert(sql1("SELECT enum_code('ok'::mood)") == 1)
      assert(sql1("SELECT enum_code('sad'::mood)") == 0)
    }
  }

  test("enum_range and enum_range_boundary (inclusive, NULL = end)") {
    withMood {
      assert(sql1("SELECT enum_range(NULL::mood)") ==
        Seq("sad", "ok", "happy"))
      assert(sql1("SELECT enum_range_boundary('sad'::mood, 'ok'::mood)") ==
        Seq("sad", "ok"))
      assert(sql1("SELECT enum_range_boundary(NULL, 'ok'::mood)") ==
        Seq("sad", "ok"))
      assert(sql1("SELECT enum_range_boundary('ok'::mood, NULL)") ==
        Seq("ok", "happy"))
    }
  }

  test("ORDER BY an enum cast sorts by DEFINITION order, not lexicographic") {
    withMood {
      val got = GraftSql.sql(spark,
        "SELECT m FROM (SELECT explode(array('happy','sad','ok')) AS m) ORDER BY m::mood")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("sad", "ok", "happy"))
    }
  }

  test("cast validates membership: raise on non-member, TRY_CAST → NULL") {
    withMood {
      assert(sql1("SELECT 'ok'::mood") == "ok")
      assert(sql1("SELECT TRY_CAST('angry' AS mood)") == null)
      val e = intercept[Exception] {
        GraftSql.sql(spark, "SELECT 'angry'::mood").collect()
      }
      assert(e.getMessage.contains("Conversion Error") ||
        Option(e.getCause).exists(_.getMessage.contains("Conversion Error")),
        e.getMessage)
      assert(sql1("SELECT CAST(NULL AS mood)") == null)
    }
  }

  test("per-row enum_code over a column expression") {
    withMood {
      val got = GraftSql.sql(spark,
        """SELECT m, enum_code(m::mood) AS c
          |FROM (SELECT explode(array('ok','happy','sad','ok')) AS m)
          |ORDER BY m, c""".stripMargin)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("happy", 2), ("ok", 1), ("ok", 1), ("sad", 0)))
    }
  }

  test("enum-typed columns in DDL become VARCHAR and round-trip") {
    withMood {
      GraftSql.sql(spark, "DROP TABLE IF EXISTS enum_ddl_t")
      GraftSql.sql(spark, "CREATE TABLE enum_ddl_t (id INTEGER, m mood)")
      GraftSql.sql(spark, "INSERT INTO enum_ddl_t VALUES (1, 'ok'), (2, 'sad')")
      val got = GraftSql.sql(spark,
        "SELECT id, m FROM enum_ddl_t ORDER BY m::mood").collect().toSeq
      assert(got == Seq(Row(2, "sad"), Row(1, "ok")))
      GraftSql.sql(spark, "DROP TABLE enum_ddl_t")
    }
  }

  test("DROP TYPE unregisters: enum_first then fails honestly") {
    GraftSql.sql(spark, "CREATE TYPE tmp_e AS ENUM ('x')")
    GraftSql.sql(spark, "DROP TYPE tmp_e")
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT enum_first(NULL::tmp_e)").collect()
    }
  }
}
