package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}

/** Phase-timing probe for the d02 minhash pipeline (BENCH_COUNT
  * showed the wall is compute, not emission — this splits the
  * compute). Run: tools/run_main.sh graft.tools.DedupProf <sfDir>
  */
object DedupProf {
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
    val reps = Dedup.representatives(docs, "doc_id", "text").cache()
    t("representatives")(reps.count())
    val hs = reps.select(col("id"), TextOps.charShingleHashes(col("__text"), 5).as("hs"))
    t("shingleHashes")(hs.select(count(lit(1))).collect()(0).getLong(0))
    t("shingleHashes+force")(hs.select(sum(size(col("hs")))).collect()(0).getLong(0))
    val sig = hs.select(col("id"), TextOps.minhashFromHashes(col("hs"), 64).as("sig"))
    t("sig+force")(sig.select(sum(size(col("sig")))).collect()(0).getLong(0))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.4)
    t("full d02 pairs")(pairs.count())
    val plan = pairs.queryExecution.executedPlan.toString
    println("[prof] ReusedExchange nodes: " + "ReusedExchange".r.findAllIn(plan).length)
    println("[prof] Exchange nodes: " + "Exchange".r.findAllIn(plan).length)
    println("[prof] Scan nodes: " + "FileScan".r.findAllIn(plan).length)
    reps.unpersist()
    s.stop()
  }
}
