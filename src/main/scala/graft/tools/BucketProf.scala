package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Bucketize

/** Per-stage timing for the bucketed TPC-H headliners: isolates the
  * parquet-decode cost (scan+filter+project of each side alone) from
  * the bucketed merge-join and the final aggregate, so the residual
  * vs the same-box DuckDB number can be attributed. Run:
  * tools/run_main.sh graft.tools.BucketProf <sfDir> [reps]
  */
object BucketProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Bucketize.ensure(s, dir) // build cost paid here, not in the stages
    def tab(n: String) = Bucketize.table(s, dir, n)
    def ts(d: String) = to_timestamp(lit(d))

    def t(name: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-34s min=${times.min}%6.2f s  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // q3 stages
    val liQ3 = tab("lineitem").filter(col("l_shipdate") > ts("1997-06-01"))
      .select(col("l_orderkey"),
        graft.functions.Exact.revenueUnits(col("l_extendedprice"), col("l_discount")).as("__rev"))
    t("q3 lineitem scan+rev")(liQ3.select(sum(col("__rev")), count(lit(1))).collect()(0).getLong(1))
    val ordQ3 = tab("orders").filter(col("o_orderdate") < ts("1997-06-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    t("q3 orders scan")(ordQ3.count())
    val custQ3 = graft.sources.Catalog.table(s, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    t("q3 customer scan")(custQ3.count())
    val co = custQ3.join(ordQ3, col("c_custkey") === col("o_custkey"))
    t("q3 cust⋈orders")(co.count())
    val joined = co.join(liQ3, col("l_orderkey") === col("o_orderkey"))
    t("q3 full join (count)")(joined.count())
    t("q3 complete")(graft.SparkEntry.queries("tpch_q3_bucketed")(s, dir).count())

    // q10 stages
    val liQ10 = tab("lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        graft.functions.Exact.revenueUnits(col("l_extendedprice"), col("l_discount")).as("__rev"))
    t("q10 lineitem scan+rev")(liQ10.select(sum(col("__rev")), count(lit(1))).collect()(0).getLong(1))
    val ordQ10 = tab("orders")
      .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-07-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    t("q10 orders scan")(ordQ10.count())
    val j10 = ordQ10.join(liQ10, col("l_orderkey") === col("o_orderkey"))
    t("q10 join (count)")(j10.count())
    t("q10 complete")(graft.SparkEntry.queries("tpch_q10_bucketed")(s, dir).count())

    // attribution splits for the q3 lineitem stage: filter-only vs
    // revenue-compute-only vs both
    t("q3 li filter+count only")(tab("lineitem")
      .filter(col("l_shipdate") > ts("1997-06-01"))
      .select(col("l_orderkey")).agg(sum(col("l_orderkey")), count(lit(1)))
      .collect()(0).getLong(1))
    t("q3 li rev only (no filter)")(tab("lineitem")
      .select(graft.functions.Exact.revenueUnits(col("l_extendedprice"), col("l_discount")).as("__rev"))
      .agg(sum(col("__rev")), count(lit(1))).collect()(0).getLong(1))

    // raw decode floors, no filter: how fast can the columns be read at all
    t("lineitem 4col full decode")(tab("lineitem")
      .select(sum(col("l_orderkey")),
        sum(unix_timestamp(col("l_shipdate"))),
        sum(col("l_extendedprice")), sum(col("l_discount")))
      .collect().length.toLong)
    t("orders 3col full decode")(tab("orders")
      .select(sum(col("o_orderkey")), sum(unix_timestamp(col("o_orderdate"))),
        sum(col("o_custkey")))
      .collect().length.toLong)
    s.stop()
  }
}
