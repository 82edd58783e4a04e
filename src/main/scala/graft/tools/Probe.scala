package graft.tools

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Ad-hoc plan/timing probe: `sbt "runMain graft.tools.Probe <sfDir>"`.
  * Times the minhash stages separately to locate bottlenecks.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val hs = docs.select(col("doc_id").as("id"),
      TextOps.shingleHashes(TextOps.charShingles(col("text"), 5)).as("hs"))
    time("shingle hashes only")(hs.write.format("noop").mode("overwrite").save())

    val sig = hs.select(col("id"), TextOps.minhashFromHashes(col("hs"), 64).as("sig"))
    time("hashes + signature (collapsed?)")(
      sig.write.format("noop").mode("overwrite").save())

    val sigC = sig.cache()
    time("signature cached")(sigC.count())

    val banded = sigC.select(col("id"),
      explode(TextOps.lshBands(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("bk"))
    val a = banded.select(col("id").as("id_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("bk"))
    val pairs = a.join(b, a("bk") === b("bk") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val n = time("candidate pairs (narrow join + distinct)")(pairs.count())
    println(s"[probe] candidate pairs: $n")
    sigC.unpersist()
    spark.stop()
  }
}
