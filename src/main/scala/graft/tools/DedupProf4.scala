package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Stage-cumulative timing probe for the d04 (lshJaccardPairs)
  * pipeline — same method as [[DedupProf2]]: each step forces one more
  * stage of the real uncached plan, so deltas expose where the wall
  * goes including prefix recomputation. Run:
  * tools/run_main.sh graft.tools.DedupProf4 <sfDir>
  */
object DedupProf4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Catalog.table(s, dir, "documents")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$n")
    }
    val numHashes = 64; val bands = 16; val r = 4
    val shingleSize = 5; val gramN = 3; val maxBucket = 256
    val estThreshold = 0.35
    val reps = graft.llm.Dedup.representatives(docs, "doc_id", "text")
    t("reps (uncached)")(reps.count())
    t("reps again (warm)")(reps.count())
    val payload = reps.select(
      col("id"),
      TextOps.minhashFromHashes(
        TextOps.charShingleHashes(col("__text"), shingleSize), numHashes).as("sig"),
      TextOps.wordNgramHashes(col("__text"), gramN).as("grams"))
    t("payload forced")(payload.select(
      sum(size(col("sig")) + size(col("grams")))).collect()(0).getLong(0))
    t("payload sig only")(payload.select(sum(size(col("sig")))).collect()(0).getLong(0))
    val narrow = payload.select(col("id"),
      explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
    val okBuckets = narrow.groupBy(col("bk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("bk"), lit(true).as("__ok"))
    t("okBuckets")(okBuckets.count())
    val masked = narrow.join(okBuckets, Seq("bk"), "left")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(
        col("bk.band").as("band"),
        when(col("__ok"), col("bk.bh"))
          .otherwise(xxhash64(col("id"), col("bk.band"), lit("__capped")))
          .as("mh")))).as("__ms"))
      .select(col("id"), transform(col("__ms"), x => x.getField("mh")).as("m"))
    t("masked")(masked.count())
    val capped = payload.join(masked, Seq("id"))
      .select(col("id"), col("sig"), col("grams"), col("m"),
        explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
      .filter(element_at(col("m"), col("bk.band") + 1) === col("bk.bh"))
    t("capped")(capped.count())
    val grouped = capped
      .groupBy(col("bk"))
      .agg(collect_list(struct(col("id"), col("sig"), col("m"), col("grams"))).as("ms"))
    t("grouped")(grouped.count())
    import graft.plans.HashExpressions.{columnOf, exprOf}
    val emitted = grouped.select(columnOf(graft.plans.LshBucketPairs(
      exprOf(col("ms")), exprOf(col("bk").getField("band")),
      numHashes, estThreshold, withGrams = true))
      .as(Seq("id_a", "id_b", "jaccard")))
    t("full generate+emit")(emitted.count())
    val plan = emitted.queryExecution.executedPlan.toString
    println(s"[prof] ReusedExchange nodes: ${plan.linesIterator.count(_.contains("ReusedExchange"))}")
    println(s"[prof] Exchange nodes: ${plan.linesIterator.count(_.contains("Exchange"))}")
    println(s"[prof] Scan nodes: ${plan.linesIterator.count(_.contains("Scan parquet"))}")
    s.stop()
  }
}
