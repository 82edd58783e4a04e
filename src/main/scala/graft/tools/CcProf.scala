package graft.tools

import org.apache.spark.sql.functions._

/** r14: round/job profile of the d07 connected-components loop —
  * how many hash-min rounds the star-edge graph needs at a given SF,
  * and where the wall goes (pairs pipeline vs CC rounds). Run:
  *   tools/run_main.sh graft.tools.CcProf <sfDir>
  */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSessionTune.adapt(s, dir)
    val docs = graft.sources.Catalog.table(s, dir, "documents")
    def tm[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ccprof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 3).foreach { i =>
      println(s"-- run $i")
      val verified = graft.llm.Dedup.minhashStarVerifiedPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, estThreshold = 0.35,
        gramN = 3, minJaccard = 0.5)
      val v = tm("pairs (count)")(verified.count())
      println(s"[ccprof] verified pairs = $v")
      val labels = tm("connectedComponents") {
        graft.llm.Dedup.connectedComponents(verified, "id_a", "id_b")
      }
      tm("labels noop")(labels.write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}

/** Shared helper so standalone tools pick up the Bench scan tuning. */
object GraftSessionTune {
  def adapt(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.GraftSession.adaptScanParallelism(s, dir)
}
