package graft.tools
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Catalog.table(s, dir, "documents")
    val pairs = graft.llm.Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.4)
    pairs.count()
    val p = pairs.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/d02_plan.txt"), p.getBytes)
    println("[dump] Reused occurrences: " + "Reused".r.findAllIn(p).length)
    println("[dump] ShuffleQueryStage: " + "ShuffleQueryStage".r.findAllIn(p).length)
    s.stop()
  }
}
