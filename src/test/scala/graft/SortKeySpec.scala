package graft

import org.scalatest.funsuite.AnyFunSuite

/** create_sort_key (plans/SortKey): the contract is ORDER
  * equivalence — sorting by the binary key must equal sorting by the
  * underlying ORDER BY clause for every type and modifier. (The
  * reference's physical byte layout is engine-internal; bytes are
  * compared, never consumed, so parity is proven on the order, not
  * the bits — see the Scaladoc.)
  */
class SortKeySpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

  private def sortCol(c: String, orderSpec: String): org.apache.spark.sql.Column =
    orderSpec match {
      case "v ASC NULLS LAST" | "a ASC NULLS LAST" => asc_nulls_last(c)
      case "v ASC NULLS FIRST" => asc_nulls_first(c)
      case "v DESC NULLS LAST" => desc_nulls_last(c)
      case "v DESC NULLS FIRST" | "b DESC NULLS FIRST" => desc_nulls_first(c)
    }

  private def checkOrder(valuesSql: String, modifier: String, orderSpec: String): Unit = {
    val df = spark.sql(valuesSql)
    val byKey = df
      .withColumn("sk", expr(s"create_sort_key(v, '$modifier')"))
      .orderBy(col("sk"), col("id")) // id tiebreak for equal keys
      .select("id").collect().map(_.getInt(0)).toSeq
    val byOrder = df
      .orderBy(sortCol("v", orderSpec), col("id"))
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(byKey === byOrder, s"order mismatch for '$modifier' over $valuesSql")
  }

  private val ints =
    """SELECT * FROM VALUES (1, 5), (2, -3), (3, 0), (4, 2147483647),
      |(5, -2147483648), (6, NULL), (7, 42), (8, -1) AS t(id, v)""".stripMargin

  private val doubles =
    """SELECT * FROM VALUES (1, 1.5D), (2, -2.25D), (3, 0.0D), (4, -0.0D),
      |(5, CAST('Infinity' AS DOUBLE)), (6, CAST('-Infinity' AS DOUBLE)),
      |(7, NULL), (8, 1e300D), (9, -1e-300D) AS t(id, v)""".stripMargin

  private val strings =
    """SELECT * FROM VALUES (1, 'abc'), (2, 'ab'), (3, ''), (4, 'abd'),
      |(5, NULL), (6, 'a'), (7, 'z'), (8, 'abcdef') AS t(id, v)""".stripMargin

  private val lists =
    """SELECT * FROM VALUES (1, array(1, 2)), (2, array(1)),
      |(3, array()), (4, array(1, 2, 3)), (5, NULL),
      |(6, array(2)), (7, array(1, NULL)) AS t(id, v)""".stripMargin

  test("integers: all four modifier combinations") {
    checkOrder(ints, "ASC NULLS LAST", "v ASC NULLS LAST")
    checkOrder(ints, "ASC NULLS FIRST", "v ASC NULLS FIRST")
    checkOrder(ints, "DESC NULLS LAST", "v DESC NULLS LAST")
    checkOrder(ints, "DESC NULLS FIRST", "v DESC NULLS FIRST")
  }

  test("doubles incl. infinities and signed zero") {
    checkOrder(doubles, "ASC NULLS LAST", "v ASC NULLS LAST")
    checkOrder(doubles, "DESC NULLS FIRST", "v DESC NULLS FIRST")
  }

  test("strings incl. prefixes and empty") {
    checkOrder(strings, "ASC NULLS LAST", "v ASC NULLS LAST")
    checkOrder(strings, "DESC NULLS LAST", "v DESC NULLS LAST")
  }

  test("lists: prefix ordering and nested nulls follow the REFERENCE") {
    // Engine divergence: Spark's ORDER BY sorts null ARRAY ELEMENTS
    // first; the reference nests NULLS LAST under ASC
    // (create_sort_key.cpp:95) — so the baseline here is the id order
    // DuckDB itself returns for ORDER BY v, pinned verbatim:
    // [] < [1] < [1,2] < [1,2,3] < [1,NULL] < [2] < NULL-row.
    def keyOrder(modifier: String): Seq[Int] =
      spark.sql(lists)
        .withColumn("sk", expr(s"create_sort_key(v, '$modifier')"))
        .orderBy(col("sk"), col("id")).select("id").collect().map(_.getInt(0)).toSeq
    assert(keyOrder("ASC NULLS LAST") === Seq(3, 2, 1, 4, 7, 6, 5))
    assert(keyOrder("DESC NULLS FIRST") === Seq(5, 6, 7, 4, 1, 2, 3))
  }

  test("multi-column keys compose: (v1 ASC, v2 DESC)") {
    val df = spark.sql(
      """SELECT * FROM VALUES (1, 1, 'b'), (2, 1, 'a'), (3, 2, 'a'),
        |(4, 1, NULL), (5, NULL, 'c'), (6, 2, 'z') AS t(id, a, b)""".stripMargin)
    val byKey = df
      .withColumn("sk", expr("create_sort_key(a, 'ASC NULLS LAST', b, 'DESC NULLS FIRST')"))
      .orderBy(col("sk"), col("id")).select("id").collect().map(_.getInt(0)).toSeq
    val byOrder = df
      .orderBy(asc_nulls_last("a"), desc_nulls_first("b"), col("id"))
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(byKey === byOrder)
  }

  test("defaults follow the reference: ASC → NULLS LAST, DESC → NULLS FIRST") {
    checkOrder(ints, "ASC", "v ASC NULLS LAST")
    checkOrder(ints, "DESC", "v DESC NULLS FIRST")
  }

  test("wide decimals (>17 significant digits) keep exact order") {
    // a double round-trip collapses values differing past ~15
    // significant digits; the exact unscaled-integer encoding must not
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1, CAST('-99999999999999999999999999999999999999' AS DECIMAL(38,0))),
        | (2, CAST('-99999999999999999999999999999999999998' AS DECIMAL(38,0))),
        | (3, CAST('-1' AS DECIMAL(38,0))),
        | (4, CAST('0' AS DECIMAL(38,0))),
        | (5, CAST('1' AS DECIMAL(38,0))),
        | (6, CAST('99999999999999999999999999999999999998' AS DECIMAL(38,0))),
        | (7, CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0)))
        | AS t(id, v)""".stripMargin)
    val keyed = df.withColumn("sk", expr("create_sort_key(v, 'ASC NULLS LAST')"))
    assert(keyed.select("sk").distinct().count() === 7)
    assert(keyed.orderBy("sk").select("id").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2, 3, 4, 5, 6, 7))
    val desc = df.withColumn("sk", expr("create_sort_key(v, 'DESC NULLS FIRST')"))
    assert(desc.orderBy("sk").select("id").collect().map(_.getInt(0)).toSeq
      === Seq(7, 6, 5, 4, 3, 2, 1))
    // narrow decimals still exact through the long path
    val nar = spark.sql(
      """SELECT * FROM VALUES (1, CAST('-2.50' AS DECIMAL(10,2))),
        | (2, CAST('-2.49' AS DECIMAL(10,2))), (3, CAST('0.00' AS DECIMAL(10,2))),
        | (4, CAST('2.49' AS DECIMAL(10,2))), (5, CAST('2.50' AS DECIMAL(10,2)))
        | AS t(id, v)""".stripMargin)
      .withColumn("sk", expr("create_sort_key(v, 'ASC NULLS LAST')"))
    assert(nar.orderBy("sk").select("id").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2, 3, 4, 5))
  }
}
