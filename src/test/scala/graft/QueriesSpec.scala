package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Every SURVEY §2 coverage item runs and returns rows on sf0.001 —
  * the same (spark, sfDir) contract the driver exercises. Value-level
  * correctness is the DuckDB oracle gate (tools/check.py); these specs
  * keep the whole surface executable.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSession._

  for (d <- SparkEntry.allDefs) {
    test(s"${d.name} runs and returns rows") {
      assert(d.fn(spark, sfDir).count() > 0, s"${d.name} returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
