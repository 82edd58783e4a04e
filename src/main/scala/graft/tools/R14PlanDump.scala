package graft.tools

import java.nio.file.{Files, Paths}

/** r14 deliverable: dump `.explain("formatted")` for bench entries to
  * plans/r14/<name>_<tag>.txt. For d02/d07 the dump is the pair-
  * generation DataFrame (the shape the r14 join changes touched) —
  * d07's entry value is the post-CC label table whose plan is just a
  * checkpoint scan. "Before" plans are produced by the override knobs
  * that restore the r13 behavior (-Dgraft.lsh.attachHint=shuffle_hash
  * -Dgraft.lsh.sigJoinHint=shuffle_hash) or from the pre-round commit.
  *
  * Run: tools/run_main.sh graft.tools.R14PlanDump <sfDir> <tag> <entry>[,...]
  */
object R14PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.adaptScanParallelism(s, dir)
    val outDir = Paths.get("plans/r14")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = name match {
        case "d02_dedup_minhash" =>
          graft.llm.Dedup.minhashPairs(
            graft.sources.Catalog.table(s, dir, "documents"), "doc_id", "text",
            numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.4)
        case "d07_dedup_star_clusters" =>
          graft.llm.Dedup.minhashStarVerifiedPairs(
            graft.sources.Catalog.table(s, dir, "documents"), "doc_id", "text",
            numHashes = 64, bands = 16, shingleSize = 5, estThreshold = 0.35,
            gramN = 3, minJaccard = 0.5)
        case n => graft.SparkEntry.queries(n)(s, dir)
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // AQE-final plan too: execute THIS QueryExecution (a noop write
      // would execute a different one and leave this plan
      // isFinalPlan=false) — toRdd.count() runs the already-planned
      // tree, so the executed plan then shows runtime join strategies,
      // AQEShuffleReads and stage/exchange reuse.
      df.queryExecution.toRdd.count()
      val fin = df.queryExecution.executedPlan.toString
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (txt + "\n\n== AQE final (executed) plan ==\n" + fin).getBytes)
      println(s"[plandump] wrote ${name}_$tag.txt")
    }
    s.stop()
  }
}
