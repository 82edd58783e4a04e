package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's interval-literal string grammar
  * (src/common/types/interval.cpp; test/sql/types/interval/
  * interval_constants.test) replayed through the dialect's
  * mixedInterval normalizer. Every expectation is DuckDB 1.0.0 output
  * for `TIMESTAMP '2000-01-01 00:00:00' + INTERVAL <text>` (pinned
  * this session) — timestamp addition renders identically on both
  * engines, unlike interval-to-VARCHAR.
  *
  * Pinned semantics: `'<bare number>' UNIT` truncates the fraction
  * toward zero except for SECOND/MILLISECOND; units inside the string
  * keep fractions with borrowing (months borrow days at 30/month,
  * days borrow clock time); three-field clocks; the mil/cent/c/dec/
  * yr/qtr/hr/min/msec/usec alias table; a leading '@'.
  */
class IntervalLiteralSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def ts(iv: String): String =
    GraftSql.sql(spark,
      s"SELECT (TIMESTAMP '2000-01-01 00:00:00' + INTERVAL $iv)::VARCHAR AS t")
      .collect()(0).getString(0)

  private val pinned = Seq(
    ("'1.5' MINUTE", "2000-01-01 00:01:00"),
    ("'1.5' HOUR", "2000-01-01 01:00:00"),
    ("'1.5' MONTH", "2000-02-01 00:00:00"),
    ("'1.5' DAY", "2000-01-02 00:00:00"),
    ("'1.5' SECOND", "2000-01-01 00:00:01.5"),
    ("'1.9' MICROSECONDS", "2000-01-01 00:00:00.000001"),
    ("'-1.5' MINUTE", "1999-12-31 23:59:00"),
    ("'1.5' MILLENNIA", "3000-01-01 00:00:00"),
    ("'2Y 1 month 02:01:03.020016'", "2002-02-01 02:01:03.020016"),
    ("'-2yrs 4 d 5 hrs 1 mins 3 seconds 20 mseconds 16 useconds'",
      "1998-01-05 05:01:03.020016"),
    ("'@2mons 1H'", "2000-03-01 01:00:00"),
    ("'05:12:34.567890'", "2000-01-01 05:12:34.56789"),
    ("'-05:12:34.567890'", "1999-12-31 18:47:25.43211"),
    ("'1 mils 2 c 1 decades 3 quarter'", "3210-10-01 00:00:00"),
    ("'1.5 months'", "2000-02-16 00:00:00"),
    ("'1.5 days'", "2000-01-02 12:00:00"),
    ("'1.5 minutes'", "2000-01-01 00:01:30"),
    ("'00:00:01'", "2000-01-01 00:00:01"),
    ("'1 day 05:12:34'", "2000-01-02 05:12:34"),
    ("'-1 day -05:12:34'", "1999-12-30 18:47:26"))

  test("interval literal grammar matches the reference (DuckDB-pinned)") {
    pinned.foreach { case (iv, want) =>
      val got = ts(iv)
      // Spark renders trailing fractional zeros the same way DuckDB
      // does for these pins (both trim), so direct equality holds
      assert(got == want, s"INTERVAL $iv: got $got want $want")
    }
  }

  test("unit keyword aliases outside the string: millennia; integral forms untouched") {
    assert(ts("3 millennia") == "5000-01-01 00:00:00")
    assert(ts("'3' MONTH") == "2000-04-01 00:00:00")
    assert(ts("'+5' DAY") == "2000-01-06 00:00:00")
  }

  test("two-field clock forms error (reference parity)") {
    intercept[Exception] {
      ts("'05:12'")
    }
  }
}
