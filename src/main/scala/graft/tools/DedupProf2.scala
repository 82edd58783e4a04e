package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}

/** Stage-cumulative timing probe for the d02 pipeline: each step
  * materializes one more stage of the real (uncached) plan, so the
  * DELTAS expose where the wall goes including Catalyst's prefix
  * recomputation multipliers. Mirrors Dedup.minhashPairs' current
  * shape (bucket-local generator, packed int sigs). Run:
  * tools/run_main.sh graft.tools.DedupProf2 <sfDir>
  */
object DedupProf2 {
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
    val numHashes = 64; val bands = 16; val r = 4; val shingleSize = 5
    val reps = Dedup.representatives(docs, "doc_id", "text")
    t("reps (uncached)")(reps.count())
    val sig = reps
      .select(col("id"), TextOps.charShingleHashes(col("__text"), shingleSize).as("hs"))
      .select(col("id"), TextOps.minhashFromHashes(col("hs"), numHashes).as("sig"))
    t("sig forced")(sig.select(sum(size(col("sig")))).collect()(0).getLong(0))
    val narrow = sig.select(col("id"),
      explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
    val okBuckets = narrow.groupBy(col("bk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= 256)
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
    val capped = sig.join(masked, Seq("id"))
      .select(col("id"), col("sig"), col("m"),
        explode(TextOps.lshBands(col("sig"), bands, r)).as("bk"))
      .filter(element_at(col("m"), col("bk.band") + 1) === col("bk.bh"))
    t("capped")(capped.count())
    val grouped = capped
      .groupBy(col("bk"))
      .agg(collect_list(struct(col("id"), col("sig"), col("m"))).as("ms"))
    t("grouped")(grouped.count())
    import graft.plans.HashExpressions.{columnOf, exprOf}
    val emitted = grouped.select(columnOf(graft.plans.LshBucketPairs(
      exprOf(col("ms")), exprOf(col("bk").getField("band")),
      numHashes, 0.4, withGrams = false)).as(Seq("id_a", "id_b", "est_jaccard")))
    t("full generate+emit")(emitted.count())
    val plan = emitted.queryExecution.executedPlan.toString
    println("[prof] ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(plan).length)
    println("[prof] Exchange nodes: " + "Exchange".r.findAllIn(plan).length)
    println("[prof] Scan nodes: " + "FileScan".r.findAllIn(plan).length)
    s.stop()
  }
}
