package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Summarize
import graft.sources.Catalog

/** SUMMARIZE profiling semantics: every column type maps to one stat
  * row, NULLs count but don't aggregate, non-orderable types degrade
  * to count-only — and the approx variant must stay a single
  * Expand-free pass (the 100 TB contract).
  */
class SummarizeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option("a"), Option(1.5), Option(Seq(1))),
    (2L, None, Option(2.5), Option(Seq.empty[Int])),
    (3L, Option("b"), None, None)
  ).toDF("id", "name", "v", "tags")

  test("one stat row per column, all types") {
    val rows = Summarize.summarize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "name", "v", "tags"))

    val id = rows("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 && id.getLong(3) == 3)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0 && id.getDouble(6) == 2.0)

    val name = rows("name")
    assert(name.getLong(2) == 1 && name.getLong(3) == 2)
    assert(name.getString(7) == "a" && name.getString(8) == "b")
    assert(name.isNullAt(4) && name.isNullAt(6))

    val v = rows("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 1.5 && v.getDouble(5) == 2.5 && v.getDouble(6) == 2.0)

    val tags = rows("tags")
    assert(tags.getLong(1) == 3 && tags.getLong(2) == 1 && tags.getLong(3) == 2)
    assert(tags.isNullAt(4) && tags.isNullAt(5) && tags.isNullAt(6) && tags.isNullAt(7))
  }

  test("approx variant: same layout, distinct within 3×rsd, NO Expand in the plan") {
    val ev = Catalog.table(spark, sfDir, "events")
    val approx = Summarize.summarizeApprox(ev)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profiling must not pay the exact-distinct Expand")
    val exact = Summarize.summarize(ev)
      .select(col("column_name"), col("n_distinct").as("d_exact"))
    val joined = approx.select(col("column_name"), col("n_distinct"))
      .join(exact, "column_name").collect()
    assert(joined.nonEmpty)
    // HLL default rsd is 5% (one σ); 3σ bounds the flake rate
    joined.foreach { case Row(c: String, d: Long, de: Long) =>
      assert(math.abs(d - de) <= math.max(1L, (de * 0.15).toLong),
        s"$c: approx $d vs exact $de")
    }
  }

  test("exact distinct pays Expand only when >1 distinct agg (documented cost)") {
    // sanity: the exact path over a multi-column table does use Expand
    val ev = Catalog.table(spark, sfDir, "events")
    assert(Summarize.summarize(ev).queryExecution.executedPlan.toString.contains("Expand"))
  }
}
