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

  test("sweep tail: huge-exponent literals, glued/repeated interval units, JSON -> path list") {
    // reference test_numeric_overflow.test: 1e1000 reads as inf
    assert(one("SELECT 1e1000 = 'inf'::DOUBLE AS a, -1e1000 = '-inf'::DOUBLE AS b, CAST(1e1000 AS REAL) = 'inf'::REAL AS c")
      == Seq(true, true, true))
    // reference test_interval.test:259/268 — quantity glued to unit,
    // and a repeated unit summing to zero
    assert(one("SELECT INTERVAL '1294967296months' = make_ym_interval(0, 1294967296) AS i") == Seq(true))
    assert(one("SELECT CAST(INTERVAL '1294967296months -1294967296months' AS STRING) AS z") ==
      Seq("0 seconds")) // the reference renders 00:00:00 — zero either way
    // reference test_json_extract.test:211 — `->` over a LIST of paths
    assert(one("""SELECT '{"b": [1,2,3,4]}'::JSON -> ['$.b[0]', '$.b[3]'] AS a""") ==
      Seq(Seq("1", "4")))
    // lambda with a list-literal body is untouched
    assert(one("SELECT transform(array(1,2), x -> [x]) AS t") == Seq(Seq(Seq(1), Seq(2))))
  }

  test("GLOB operator compiles literal patterns to anchored regexes (DuckDB-pinned)") {
    // every case below returns the same value in DuckDB 1.0.0
    assert(one("SELECT '3' GLOB '[0-9]' a, '012' GLOB '[0-9][0-9][0-9]' b, 'a' GLOB '[!0-9]' c") ==
      Seq(true, true, true))
    assert(one("""SELECT '*' GLOB '\*' d, '3]' GLOB '[]3][]]' e, '?' GLOB '[?]' f, '*' GLOB '[*]' g""") ==
      Seq(true, true, true, true))
    assert(one("SELECT '6' GLOB '[1-35-7]' h, 'b3' GLOB '[abc0-9][abc0-9]' i, 'abc' GLOB 'a*c' j, 'abc' GLOB 'a?c' k") ==
      Seq(true, true, true, true))
    assert(one("SELECT 'abc' GLOB 'A*' l, 'abc' NOT GLOB 'a*' m") == Seq(false, false))
  }

  test("DATE/TIMESTAMP infinity sentinels and short-year literals (DuckDB semantics)") {
    // the reference's ±infinity ARE the extreme int32-day/int64-micro
    // values — ordering matches; rendering is the one divergence
    assert(one("SELECT DATE 'infinity' > DATE '9999-12-31' a, TIMESTAMP 'infinity' > TIMESTAMP '9999-12-31 23:59:59' b, " +
      "DATE '-infinity' < DATE '0001-01-01' c, CAST(DATE 'epoch' AS STRING) e") ==
      Seq(true, true, true, "1970-01-01"))
    // short/negative years: century(209-03-22) = 3 (DuckDB-pinned);
    // '-8-01-01' is astronomical year -8 = 9 BC
    assert(one("SELECT century(TIMESTAMP '209-03-22') c, year(TIMESTAMP '-8-01-01 00:00:01.5') y") ==
      Seq(3L, -8))
  }

  test("DISTINCT ON: ordinal keys and trailing LIMIT (DuckDB-pinned)") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW don AS SELECT * FROM (VALUES (1,10),(1,20),(2,30)) v(i,j)")
    assert(GraftSql.sql(spark, "SELECT DISTINCT ON (1) i, j FROM don ORDER BY i LIMIT 1")
      .collect().map(_.toSeq).toSeq == Seq(Seq(1, 10)))
    assert(GraftSql.sql(spark, "SELECT DISTINCT ON (1) i, j FROM don ORDER BY i, j DESC")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Int]) ==
      Seq(Seq(1, 20), Seq(2, 30)))
  }

  test("NATURAL SEMI/ANTI JOIN resolves common columns from the catalog (DuckDB-pinned)") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW nsj_l AS SELECT * FROM (VALUES (1,10),(2,20),(3,30)) v(k, a)")
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW nsj_r AS SELECT * FROM (VALUES (1,99),(1,98)) v(k, b)")
    assert(GraftSql.sql(spark, "SELECT * FROM nsj_l NATURAL SEMI JOIN nsj_r ORDER BY k")
      .collect().map(_.toSeq).toSeq == Seq(Seq(1, 10)))
    assert(GraftSql.sql(spark, "SELECT * FROM nsj_l NATURAL ANTI JOIN nsj_r ORDER BY k")
      .collect().map(_.toSeq).toSeq == Seq(Seq(2, 20), Seq(3, 30)))
  }

  test("LIMIT percent: expression percents and OFFSET (test_limit_percent.test pinned)") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW lp AS SELECT * FROM range(10) t(a)")
    assert(GraftSql.sql(spark, "SELECT a FROM lp LIMIT 50% OFFSET 2")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L, 5L, 6L))
    assert(GraftSql.sql(spark, "SELECT a FROM lp LIMIT (30-10) %")
      .collect().length == 2)
  }

  test("aggregate state export: EXPORT_STATE / FINALIZE / COMBINE (test_state_export.test pinned)") {
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW dummy AS SELECT id % 10 AS g, id AS d FROM range(100)")
    // reference: SELECT count(*), sum(d), min(d), max(d) == finalized states
    assert(one("SELECT finalize(count(*) EXPORT_STATE)::BIGINT AS a, finalize(sum(d) EXPORT_STATE)::BIGINT AS b, " +
      "finalize(min(d) EXPORT_STATE)::BIGINT AS mn, finalize(max(d) EXPORT_STATE)::BIGINT AS mx FROM dummy") ==
      Seq(100L, 4950L, 0L, 99L))
    // self-combine doubles the sum (reference res2: sum(d)*2)
    assert(one("SELECT FINALIZE(COMBINE(SUM(d) EXPORT_STATE, SUM(d) EXPORT_STATE))::BIGINT AS s FROM dummy") ==
      Seq(9900L))
    // persisted state + NULL-state combine through left joins — the
    // reference's own expected rows (g 0..4: 450/NULL/450 ... 490/490/980)
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW st2 AS SELECT g, sum(d) EXPORT_STATE sum_state FROM dummy WHERE g < 5 GROUP BY g")
    val joined = GraftSql.sql(spark,
      "with groups as (select distinct g from dummy) " +
      "select g, FINALIZE(sum_state)::BIGINT f1, FINALIZE(sum_state2)::BIGINT f2, " +
      "FINALIZE(COMBINE(sum_state, sum_state2))::BIGINT fc " +
      "from groups left join st2 using(g) left join " +
      "(select g, sum(d) EXPORT_STATE sum_state2 from dummy where g >= 3 GROUP BY g) using (g) " +
      "order by g").collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toSeq
    assert(joined.take(5) == Seq(
      (0L, 450L, null, 450L), (1L, 460L, null, 460L), (2L, 470L, null, 470L),
      (3L, 480L, 480L, 960L), (4L, 490L, 490L, 980L)))
    assert(joined(5) == ((5L, null, 500L, 500L)))
  }

  test("integer cast targets round like the reference (DuckDB-pinned)") {
    // double → integral: round half to EVEN (cast_operators rint)
    assert(one("SELECT 49.5::DOUBLE::INTEGER a, 48.5::DOUBLE::INTEGER b, (-49.5)::DOUBLE::INTEGER c, CAST(2.7::DOUBLE AS INTEGER) e") ==
      Seq(50, 48, -50, 3))
    // decimal → integral: half AWAY from zero
    assert(one("SELECT CAST(CAST(49.5 AS DECIMAL(4,1)) AS INTEGER) a, CAST(CAST(48.5 AS DECIMAL(4,1)) AS INTEGER) b, CAST(CAST(-49.5 AS DECIMAL(4,1)) AS INTEGER) c") ==
      Seq(50, 49, -50))
    // string → integral: parse then half away; TRY_CAST tolerates junk
    assert(one("SELECT '48.5'::INTEGER s1, '-48.5'::INTEGER s2, TRY_CAST('abc' AS INTEGER) s3, TRY_CAST('48.5' AS INTEGER) s4") ==
      Seq(49, -49, null, 49))
    // integral identity and array targets untouched
    assert(one("SELECT 42::BIGINT i1, NULL::INTEGER n, CAST(array(1,2) AS INT[]) arr") ==
      Seq(42L, null, Seq(1, 2)))
    // plain CAST of junk strings still errors (both engines)
    val e = intercept[Exception] {
      GraftSql.sql(spark, "SELECT CAST('abc' AS INTEGER)").collect()
    }
    assert(Option(e.getMessage).getOrElse(e.toString).contains("invalid input"))
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

  test("r12: big digit strings cast exactly (no Double detour past 2^53)") {
    // the reference parses string→int digits exactly
    // (integer_cast_operator.hpp); a Double round-trip corrupts
    // >15-16 significant digits and overflows int64 max
    assert(one("SELECT '9223372036854775807'::BIGINT a, " +
      "'-9223372036854775808'::BIGINT b, '9007199254740993'::BIGINT c") ==
      Seq(Long.MaxValue, Long.MinValue, 9007199254740993L))
    // string COLUMN path (rintWrap fires on every non-literal operand)
    GraftSql.sql(spark,
      "CREATE OR REPLACE TEMP VIEW bigs AS SELECT '9223372036854775806' AS s")
    assert(one("SELECT s::BIGINT v FROM bigs") == Seq(9223372036854775806L))
    // out-of-range parse errors cleanly in plain CAST; TRY_CAST → NULL
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT '1e300'::BIGINT").collect()
    }
    assert(one("SELECT TRY_CAST('1e300' AS BIGINT) v") == Seq(null))
    // fractional strings still round half away from zero
    assert(one("SELECT '9007199254740992.5'::BIGINT v") == Seq(9007199254740993L))
  }

  test("r12: FINALIZE keeps the aggregate's native type (exact past 2^53)") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW fs2 AS " +
      "SELECT CAST(9007199254740993 AS BIGINT) AS v UNION ALL SELECT CAST(2 AS BIGINT)")
    // 2^53+1 + 2: a DOUBLE-cast finalize loses the low bit
    assert(one("SELECT finalize(sum(v) EXPORT_STATE) s FROM fs2") ==
      Seq(9007199254740995L))
    assert(one("SELECT finalize(min(v) EXPORT_STATE) mn, " +
      "finalize(max(v) EXPORT_STATE) mx FROM fs2") == Seq(2L, 9007199254740993L))
    assert(one("SELECT finalize(count(*) EXPORT_STATE) c FROM fs2") == Seq(2L))
  }

  test("r13: LIMIT percent edge semantics pinned against the reference") {
    GraftSql.sql(spark, "CREATE OR REPLACE TEMP VIEW lp2 AS SELECT * FROM range(10) t(a)")
    // NULL percent means 100%, NULL offset means 0 (not an error)
    assert(GraftSql.sql(spark, "SELECT a FROM lp2 LIMIT (NULL) %").collect().length == 10)
    assert(GraftSql.sql(spark, "SELECT a FROM lp2 LIMIT 50% OFFSET (NULL)")
      .collect().length == 5)
    // out-of-range percent is OutOfRangeException, never a clamp
    assert(intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT a FROM lp2 LIMIT (0-50) %").collect()
    }.getMessage.contains("Out of Range"))
    assert(intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT a FROM lp2 LIMIT (200) %").collect()
    }.getMessage.contains("Out of Range"))
  }

  test("BC dates: astronomical year mapping (year N BC = -(N-1))") {
    assert(one("SELECT year('0044-03-15 (BC)'::DATE) AS y, " +
      "('0044-03-15 (BC)'::DATE < '0001-01-01'::DATE) AS lt") == Seq(-43, true))
    assert(one("SELECT year('0001-01-01 (BC)'::DATE) AS y") == Seq(0))
  }
}
