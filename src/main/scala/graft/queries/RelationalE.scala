package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Sampling
import graft.sources.Catalog

/** Round-2 relational breadth: real sampling methods (reservoir /
  * bernoulli — the reference's TABLESAMPLE surface) and dynamic PIVOT
  * (distinct-value discovery, not a hard-coded value list).
  */
object RelationalE {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QDef] = Seq(

    // R34b: reservoir sampling — fixed-size uniform sample as
    // distributed bottom-k over a seeded draw (no global sort). The
    // oracle checks the fixed-size contract exactly; distribution
    // properties are asserted in SamplingSpec.
    QDef.sql("q34b_reservoir_sample",
      "SELECT CAST(500 AS BIGINT) AS n") { (s, dir) =>
      Sampling.reservoir(t(s, dir, "lineitem"), n = 500, seed = 42L)
        .agg(count(lit(1)).as("n"))
    },

    // R34c: bernoulli (streaming) sampling — per-row coin flips, a
    // pure scan-side filter. Row count is random by construction →
    // rows-only entry; statistical bounds live in SamplingSpec.
    QDef.rowsOnly("q34c_bernoulli_sample") { (s, dir) =>
      Sampling.bernoulli(t(s, dir, "orders"), p = 0.1, seed = 42L)
        .agg(count(lit(1)).as("n"),
          graft.functions.Exact.dsum(col("o_totalprice")).as("total"))
    },

    // R26b: dynamic PIVOT — pivot values DISCOVERED from the data
    // (Spark runs the distinct-value job; DuckDB's PIVOT does the
    // same), not a hard-coded list like q26. Aggregates stay DECIMAL
    // end-to-end so both engines emit identical exact values.
    QDef.sql("q26b_dynamic_pivot",
      """SELECT * FROM (
        |  PIVOT (SELECT l_linestatus, l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS q FROM lineitem)
        |  ON l_returnflag USING SUM(q) GROUP BY l_linestatus)
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag") // no value list: discovery pass, like DuckDB
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))))
        .orderBy(col("l_linestatus"))
    }
  )
}
