package graft

import org.scalatest.funsuite.AnyFunSuite

/** r12 sweep-residue burn-down — the last open classes from the
  * reference's own sqllogictest corpus, each closed with an engine
  * fix and pinned here against DuckDB 1.0.0 output for the same text
  * (pinned this session), except where the pin names the reference's
  * newer expectation explicitly.
  */
class SweepTailSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def one(q: String): Seq[Any] =
    GraftSql.sql(spark, q).collect()(0).toSeq

  private def rows(q: String): Seq[Seq[Any]] =
    GraftSql.sql(spark, q).collect().toSeq.map(_.toSeq)

  test("empty grouping element (): one global group; composes with other keys") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW students AS SELECT * FROM " +
      "(VALUES ('math','a',1),('math','b',2),('cs','a',3)) v(course, type, value)")
    assert(one("select count(*) from students group by ()") == Seq(3L))
    assert(one("select 1 from students group by ()") == Seq(1))
    assert(rows("select course, count(*) from students group by (), course, () ORDER BY 1") ==
      Seq(Seq("cs", 1L), Seq("math", 2L)))
    // rollup/cube composition — same row SET as DuckDB
    assert(rows("select course as crs, type, count(*) from students " +
      "group by rollup (crs), (), type order by 1 NULLS LAST, 2, 3").toSet ==
      Set(Seq("cs", "a", 1L), Seq("math", "a", 1L), Seq("math", "b", 1L),
        Seq(null, "a", 2L), Seq(null, "b", 1L)))
  }

  test("mixed-type inline tables outside INSERT coerce strings to DOUBLE") {
    assert(one("SELECT min(v) m, count(*) c FROM " +
      "(VALUES (-1e308), (-0.5), (0), ('inf'), ('-inf'), (0.5)) t(v)") ==
      Seq(Double.NegativeInfinity, 6L))
  }

  test("DISTINCT ON inside a FROM-less correlated scalar subquery") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW don2 AS SELECT * FROM " +
      "(VALUES (1,1),(1,2),(2,3)) v(i,j)")
    assert(rows("SELECT i, j, (SELECT DISTINCT ON(i) j) AS k FROM don2 ORDER BY i, j") ==
      Seq(Seq(1, 1, 1), Seq(1, 2, 2), Seq(2, 3, 3)))
  }

  test("GLOB: malformed literal patterns match nothing; column patterns run per row") {
    assert(one("SELECT '3' GLOB '[3' a, '3' GLOB '[3-' b, '3' GLOB '\\' c, '4' GLOB '[' d") ==
      Seq(false, false, false, false))
    assert(one("SELECT '3' GLOB pat b FROM (VALUES ('[0-9]')) v(pat)") == Seq(true))
    assert(one("SELECT 'a' GLOB NULL n") == Seq(null))
  }

  test("LIKE/ILIKE ESCAPE edges: NULL escape is NULL; empty escape is no escape") {
    assert(one("select 'a' like 'a' escape NULL a, '%_' LIKE '%_' ESCAPE '' b, " +
      "'%++' NOT LIKE '*%++' ESCAPE '*' c") == Seq(null, true, false))
  }

  test("SIMILAR TO: NOT form and non-literal patterns") {
    assert(one("SELECT 'aaa' NOT SIMILAR TO '[b-z]{3}' a, " +
      "'aba' SIMILAR TO p b FROM (VALUES ('ab.')) v(p)") == Seq(true, true))
  }

  test("ROW constructor and `T ARRAY` type spelling") {
    val r = GraftSql.sql(spark,
      "SELECT ROW(42, 84)::STRUCT(a INT, b INT) r, [1,2,3]::INT ARRAY arr").collect()(0)
    assert(r.getStruct(0).toSeq == Seq(42, 84))
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))
  }

  test("JSON -> with a runtime (non-literal) path") {
    // integer path = array index (DuckDB-pinned: '1')
    assert(one("SELECT '[1, 2, 3]' -> p AS v FROM (VALUES (0)) t(p)") == Seq("1"))
    // bare key with spaces = one object key (the reference's own
    // test expectation — json/issue; DuckDB 1.0.0 returned NULL here)
    assert(one("""SELECT '{"Status / SubStatus": "test"}' -> p AS v FROM (VALUES ('Status / SubStatus')) t(p)""") ==
      Seq("test"))
  }

  test("inline ORDER BY on order-insensitive aggregates; ordered first/list forms") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW oa AS SELECT * FROM " +
      "(VALUES (1,1),(1,2),(2,3)) v(i,j)")
    assert(one("SELECT sum(j ORDER BY ABS(j))::BIGINT a, COUNT(1 ORDER BY 1) b, " +
      "first(DISTINCT i ORDER BY i) c FROM oa") == Seq(6L, 3L, 1))
    assert(one("SELECT list(DISTINCT j ORDER BY j DESC) d FROM oa") ==
      Seq(Seq(3, 2, 1)))
  }

  test("POSITIONAL JOIN: zip by scan position, NULL padding (DuckDB-pinned)") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW pj3 AS SELECT * FROM (VALUES (1),(2),(3)) v(a)")
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW pj2 AS SELECT * FROM (VALUES (10),(20)) v(b)")
    assert(rows("SELECT * FROM pj3 t1 POSITIONAL JOIN pj2 t2") ==
      Seq(Seq(1, 10), Seq(2, 20), Seq(3, null)))
    assert(rows("SELECT t1.a, t2.b FROM pj3 t1 POSITIONAL JOIN pj2 t2 WHERE t1.a <> 2") ==
      Seq(Seq(1, 10), Seq(3, null)))
    // r13: zip OUTPUT ORDER survives LIMIT without an explicit ORDER BY
    // (the rewrite appends ORDER BY the coalesced position)
    assert(rows("SELECT t1.a, t2.b FROM pj3 t1 POSITIONAL JOIN pj2 t2 LIMIT 2") ==
      Seq(Seq(1, 10), Seq(2, 20)))
    // an explicit ORDER BY still wins
    assert(rows("SELECT t1.a, t2.b FROM pj3 t1 POSITIONAL JOIN pj2 t2 ORDER BY t1.a DESC LIMIT 1") ==
      Seq(Seq(3, null)))
  }

  test("ASOF SEMI JOIN and ASOF over parenthesized relations in CTE bodies") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW ap AS SELECT * FROM (VALUES (1),(5),(12)) v(begin)")
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW ae AS SELECT * FROM (VALUES (3),(10)) v(begin)")
    assert(rows("SELECT p.begin FROM ap p ASOF SEMI JOIN ae e ON p.begin >= e.begin " +
      "ORDER BY p.begin ASC") == Seq(Seq(5), Seq(12)))
    assert(rows("WITH t as (SELECT t1.col0 AS left_val, t2.col0 AS right_val, " +
      "FROM (VALUES (0), (5), (10), (15)) AS t1 ASOF JOIN (VALUES (2), (7)) t2 " +
      "ON t1.col0 >= t2.col0) SELECT * FROM t ORDER BY 1") ==
      Seq(Seq(5, 2), Seq(10, 7), Seq(15, 7)))
  }

  test("TABLESAMPLE RESERVOIR(n) and LIMIT percent expression forms") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW ts10 AS SELECT * FROM range(10) t(a)")
    assert(one("SELECT COUNT(*) FROM ts10 TABLESAMPLE RESERVOIR(100)") == Seq(10L))
    // 20% of 10 = 2 rows (percent from a scalar subquery)
    assert(GraftSql.sql(spark,
      "SELECT a FROM ts10 LIMIT (SELECT COUNT(*) * 10 FROM (VALUES (1),(2)) v(x)) %")
      .collect().length == 2)
  }

  test("string-literal aliases and slash-date casts") {
    assert(GraftSql.sql(spark, "SELECT 1 AS 'hello world'").columns.toSeq ==
      Seq("hello world"))
    assert(one("SELECT '2017/06/12'::DATE::VARCHAR d") == Seq("2017-06-12"))
  }

  test("parenthesized single-parameter lambdas") {
    assert(one("SELECT list_filter([1,2,3], (x) -> x > 1) l") == Seq(Seq(2, 3)))
  }

  test("interval forms in DDL inserts: clock-form strings") {
    assert(one("SELECT (TIMESTAMP '2000-01-01 00:00:00' + interval '00:00:01')::VARCHAR t") ==
      Seq("2000-01-01 00:00:01"))
  }

  // ---- r14 singleton burn-down (the last 7 sweep residuals) ----

  test("bare alias with quoted column list: integers t('k')") {
    // table_alias_single_quotes.test — both the AS 't'('k') (r13) and
    // the bare t('k') forms
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW sq_int AS " +
      "SELECT * FROM (VALUES (1), (2), (3)) v(i)")
    assert(rows("SELECT t.k FROM sq_int t('k') ORDER BY ALL") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    assert(rows("SELECT t.k FROM sq_int AS 't'('k') ORDER BY ALL") ==
      Seq(Seq(1), Seq(2), Seq(3)))
    // a genuine table function after FROM is untouched
    assert(one("SELECT * FROM query('SELECT 7')") == Seq(7))
  }

  test("ASOF JOIN ... USING — lazy LATERAL rewrite, correlated-subquery-safe") {
    // test_asof_join_subquery.test: the full correlated statement,
    // DuckDB-pinned rows (1,3,6,8 all true)
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW au_events AS SELECT * " +
      "FROM (VALUES (1.0, 0),(3.0, 1),(6.0, 2),(8.0, 3)) t(begin, value)")
    assert(rows("SELECT e1.value FROM au_events e1 ASOF JOIN range(1, 10) " +
      "tbl(begin) USING (begin) ORDER BY 1") ==
      Seq(Seq(0), Seq(1), Seq(2), Seq(3)))
    val corr = rows(
      """SELECT begin, value IN (
        | SELECT e1.value FROM (
        |  SELECT * FROM au_events e1 WHERE e1.value = au_events.value) e1
        | ASOF JOIN range(1, 10) tbl(begin) USING (begin))
        |FROM au_events ORDER BY ALL""".stripMargin)
    assert(corr.map(_(1)) == Seq(true, true, true, true))
    // backward semantics: left rows BEFORE every right time drop (inner)
    assert(rows("SELECT e1.value FROM (SELECT 0.5 AS begin, 9 AS value) e1 " +
      "ASOF JOIN range(1, 10) tbl(begin) USING (begin)").isEmpty)
  }

  test("postgres deferred-ON join nesting parenthesizes inner joins") {
    // pg_lateral.test shapes: each ON closes the most recent open join
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW nj_a AS SELECT 1 AS x")
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW nj_b AS SELECT 1 AS y")
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW nj_c AS SELECT 1 AS z")
    // a join (b join c on b.y=c.z) on a.x=b.y
    assert(rows("SELECT * FROM nj_a JOIN nj_b JOIN nj_c ON y = z ON x = y") ==
      Seq(Seq(1, 1, 1)))
    // left-outer outer level with empty inner side keeps the left row
    assert(rows("SELECT x, y FROM nj_a LEFT JOIN nj_b JOIN nj_c " +
      "ON y = z + 1 ON x = y") == Seq(Seq(1, null)))
    // normal left-assoc chains are untouched by the pass
    assert(rows("SELECT * FROM nj_a JOIN nj_b ON x = y JOIN nj_c ON y = z") ==
      Seq(Seq(1, 1, 1)))
  }

  test("FROM-less QUALIFY inside a lateral comma subquery") {
    // lateral_qualify.test — both statements, DuckDB-pinned
    assert(rows("FROM (SELECT 42) t(x), " +
      "(SELECT x, row_number() OVER () QUALIFY NULL)").isEmpty)
    assert(rows("FROM (SELECT 42) t(x), " +
      "(SELECT x * 2 QUALIFY row_number() OVER () < 10)") == Seq(Seq(42, 84)))
  }
}
