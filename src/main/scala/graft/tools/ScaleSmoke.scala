package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Scale-up smoke: synthesize an sf1-equivalent dataset (10× sf0.1,
  * key-shifted copies so join fan-outs stay realistic) and run the
  * headline suite at both scales. Near-linear wall-clock growth at 10×
  * data on fixed cores is the signature of plans that scale out;
  * anything super-linear is a shuffle/skew bug to hunt.
  *
  * `sbt "runMain graft.tools.ScaleSmoke"` → per-query sf0.1 vs sf1
  * seconds + ratio.
  */
object ScaleSmoke {
  private val base = "/root/testdata/sf0.1"
  private val out = "/tmp/graft_sf1"

  /** Key columns to shift per replica so keys stay join-consistent and
    * cardinalities grow 10× (dims stay fixed like TPC-H nation/region).
    */
  private val keyShifts: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val copies = 10
  private val Shift = 100000000L

  def build(spark: SparkSession): Unit = {
    val done = new java.io.File(s"$out/_DONE")
    if (done.exists()) return
    Catalog.tableNames.foreach { name =>
      val df = Catalog.table(spark, base, name)
      val scaled: DataFrame = keyShifts.get(name) match {
        case None => df // fixed dims: region, nation, supplier, part
        case Some(keys) =>
          df.withColumn("__r", explode(sequence(lit(0L), lit(copies - 1L))))
            .select(df.columns.map {
              case c if keys.contains(c) => (col(c) + col("__r") * Shift).as(c)
              case c => col(c)
            }: _*)
      }
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }
    done.createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    build(spark)

    val all = Seq("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q18",
      "q07_groupjoin", "q31_asof_join", "d01_dedup_exact",
      "d02_dedup_minhash", "d03_dedup_simhash", "d04_ngram_jaccard",
      "d07_dedup_star_clusters", "s03_ann_ivf", "s04_ann_ivf_index",
      "t04_fingerprint", "t05_pii_redact", "st02_sessionize",
      "q55_window_exclude", "s10_summarize", "t02_quality_score",
      "t03_token_count", "p05_crossdoc_grams", "p07_contamination",
      "d08_line_dedup", "p08_dsir_select", "s08_ann_pq", "p09_quality_classifier",
      "p11_semdedup", "p12_ngram_lm")
    // optional name filter: runMain graft.tools.ScaleSmoke p07_contamination
    val names = if (args.isEmpty) all else {
      val unknown = args.toSeq.filterNot(all.contains)
      require(unknown.isEmpty, s"unknown ScaleSmoke queries: ${unknown.mkString(", ")}")
      args.toSeq
    }

    def run(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    names.foreach { n => run(base, n) }

    println(f"${"query"}%-20s ${"sf0.1"}%8s ${"sf1"}%8s  ratio (10x data)")
    names.foreach { n =>
      val a = run(base, n)
      val b = run(out, n)
      println(f"$n%-20s $a%8.2f $b%8.2f  ${b / a}%5.1fx")
    }
    spark.stop()
  }
}
