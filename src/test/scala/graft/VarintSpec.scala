package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VarintKernel

/** VARINT (arbitrary-precision integer) — values pinned against the
  * reference's own sqllogictest expectations
  * (test/sql/types/varint/test_varint_comparisons.test,
  * test_varchar_varint_conversion.test); the oracle's python-duckdb
  * is 1.0.0, which predates the type, so the reference tests ARE the
  * oracle here.
  */
class VarintSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def one(q: String): Seq[Any] =
    GraftSql.sql(spark, q).collect()(0).toSeq

  test("kernel encoding is order-preserving over the reference's comparison fixture") {
    // the exact value set of test_varint_comparisons.test
    val vals = Seq(
      "9223372036854775807", "-9223372036854775808", "2147483647",
      "-2147483648", "32767", "-32768", "255", "0", "-1", "1",
      "340282366920938463463374607431768211455",
      "-170141183460469231731687303715884105727",
      "170141183460469231731687303715884105727",
      "340282366920938463463374607431768211455987",
      "-340282366920938463463374607431768211455987")
    val byNumeric = vals.sortBy(BigInt(_))
    val byBytes = vals.sortBy(v =>
      VarintKernel.parse(org.apache.spark.unsafe.types.UTF8String.fromString(v))
        .map(b => f"${b & 0xff}%02x").mkString)
    assert(byBytes == byNumeric,
      "bytewise-unsigned order must equal numeric order")
    // round-trips are exact and canonical (leading zeros/plus dropped)
    vals.foreach { v =>
      val enc = VarintKernel.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      assert(VarintKernel.render(enc).toString == v)
    }
    assert(VarintKernel.render(VarintKernel.parse(
      org.apache.spark.unsafe.types.UTF8String.fromString("+00042"))).toString == "42")
  }

  test("SQL surface: casts, comparisons, DOUBLE escape (reference-pinned)") {
    val r = one(
      """SELECT
        | CAST('340282366920938463463374607431768211455987'::VARINT AS VARCHAR),
        | CAST('-340282366920938463463374607431768211455987'::VARINT AS VARCHAR),
        | ('340282366920938463463374607431768211455987'::VARINT
        |    < '340282366920938463463374607431768211455988'::VARINT),
        | ('-340282366920938463463374607431768211455987'::VARINT
        |    < '-170141183460469231731687303715884105727'::VARINT),
        | ('9223372036854775807'::VARINT < '340282366920938463463374607431768211455'::VARINT),
        | CAST('100000000000000000000000000000000000000000000000000'::VARINT AS DOUBLE)""".stripMargin)
    assert(r(0) == "340282366920938463463374607431768211455987")
    assert(r(1) == "-340282366920938463463374607431768211455987")
    assert(r(2) == true && r(3) == true && r(4) == true)
    assert(r(5) == 1e50)
  }

  test("VARINT table column: DDL, >39-digit INSERT, ORDER BY, GROUP BY") {
    spark.sql("CREATE DATABASE IF NOT EXISTS varintdb")
    spark.sql("USE varintdb")
    try {
      GraftSql.runScript(spark,
        """CREATE OR REPLACE TABLE vt (a VARINT);
          |INSERT INTO vt VALUES
          | ('340282366920938463463374607431768211455987'::VARINT),
          | ('-340282366920938463463374607431768211455987'::VARINT),
          | ('0'::VARINT),
          | ('170141183460469231731687303715884105727'::VARINT),
          | ('170141183460469231731687303715884105727'::VARINT)""".stripMargin)
      // native BinaryType ORDER BY = numeric order (order-preserving encoding)
      val ordered = GraftSql.sql(spark,
        "SELECT varint_str(a) AS s FROM vt ORDER BY a")
        .collect().map(_.getString(0)).toSeq
      assert(ordered == Seq(
        "-340282366920938463463374607431768211455987", "0",
        "170141183460469231731687303715884105727",
        "170141183460469231731687303715884105727",
        "340282366920938463463374607431768211455987"))
      // native GROUP BY over the encoding
      val grouped = GraftSql.sql(spark,
        "SELECT varint_str(a) AS s, COUNT(*) AS n FROM vt GROUP BY a ORDER BY a")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(grouped.map(_._2) == Seq(1L, 1L, 2L, 1L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS vt")
      spark.sql("USE default")
    }
  }
}
