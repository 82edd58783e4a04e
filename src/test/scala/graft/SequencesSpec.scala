package graft

import org.scalatest.funsuite.AnyFunSuite

/** CREATE/DROP SEQUENCE + nextval/currval (plans/Sequences). Every
  * expectation is the reference's own, from
  * test/sql/catalog/sequence/test_sequence.test and
  * sequence_cycle.test.
  */
class SequencesSpec extends AnyFunSuite {
  import TestSession._

  private def one(q: String): Any = GraftSql.sql(spark, q).collect()(0).get(0)
  private def row(q: String): Seq[Any] = GraftSql.sql(spark, q).collect()(0).toSeq

  test("basic lifecycle matches test_sequence.test") {
    GraftSql.sql(spark, "DROP SEQUENCE IF EXISTS seq")
    GraftSql.sql(spark, "CREATE SEQUENCE seq")
    intercept[Exception](GraftSql.sql(spark, "CREATE SEQUENCE seq"))
    GraftSql.sql(spark, "CREATE SEQUENCE IF NOT EXISTS seq")
    assert(one("SELECT nextval('seq')") === 1L)
    GraftSql.sql(spark, "CREATE OR REPLACE SEQUENCE seq")
    assert(one("SELECT nextval('seq')") === 1L)
    assert(one("SELECT currval('seq')") === 1L)
    assert(one("SELECT currval('seq')") === 1L)
    assert(one("SELECT nextval('seq')") === 2L)
    assert(one("SELECT currval('seq')") === 2L)
    assert(row("SELECT nextval('seq'), nextval('seq')") === Seq(3L, 4L))
    assert(one("SELECT nextval(NULL)") === null)
    assert(one("SELECT currval(NULL)") === null)
    GraftSql.sql(spark, "DROP SEQUENCE seq")
    intercept[Exception](GraftSql.sql(spark, "DROP SEQUENCE seq"))
    GraftSql.sql(spark, "DROP SEQUENCE IF EXISTS seq")
    // currval before any nextval errors; unknown sequence errors
    GraftSql.sql(spark, "CREATE SEQUENCE seq2")
    intercept[Exception](one("SELECT currval('seq2')"))
    intercept[Exception](one("SELECT nextval('no_such_seq')"))
    GraftSql.sql(spark, "DROP SEQUENCE seq2")
  }

  test("START WITH / INCREMENT BY / CYCLE (sequence_cycle.test shapes)") {
    GraftSql.sql(spark, "DROP SEQUENCE IF EXISTS sc")
    GraftSql.sql(spark, "CREATE SEQUENCE sc START WITH 5 INCREMENT BY 10")
    assert(row("SELECT nextval('sc') a, nextval('sc') b") === Seq(5L, 15L))
    GraftSql.sql(spark, "DROP SEQUENCE sc")
    // ascending cycle wraps to MINVALUE
    GraftSql.sql(spark, "CREATE SEQUENCE sc MINVALUE 1 MAXVALUE 3 CYCLE")
    assert((1 to 4).map(_ => one("SELECT nextval('sc')")) === Seq(1L, 2L, 3L, 1L))
    GraftSql.sql(spark, "DROP SEQUENCE sc")
    // no cycle: exceeding MAXVALUE raises
    GraftSql.sql(spark, "CREATE SEQUENCE sc MAXVALUE 2")
    assert(one("SELECT nextval('sc')") === 1L)
    assert(one("SELECT nextval('sc')") === 2L)
    intercept[Exception](one("SELECT nextval('sc')"))
    GraftSql.sql(spark, "DROP SEQUENCE sc")
    // descending with cycle wraps to MAXVALUE
    GraftSql.sql(spark,
      "CREATE SEQUENCE sc START WITH 100 INCREMENT BY -2 MINVALUE 96 MAXVALUE 100 CYCLE")
    assert((1 to 4).map(_ => one("SELECT nextval('sc')")) === Seq(100L, 98L, 96L, 100L))
    GraftSql.sql(spark, "DROP SEQUENCE sc")
  }

  test("nextval advances per ROW of a query") {
    GraftSql.sql(spark, "DROP SEQUENCE IF EXISTS rowseq")
    GraftSql.sql(spark, "CREATE SEQUENCE rowseq")
    val ids = GraftSql.sql(spark,
      "SELECT nextval('rowseq') AS id FROM range(5)")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L, 5L))
    GraftSql.sql(spark, "DROP SEQUENCE rowseq")
  }
}
