package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity, TextOps}

/** Hard codegen gate for every custom expression: with
  * spark.sql.codegen.fallback=false a Janino failure aborts the query
  * instead of silently dropping the stage to the interpreted path —
  * so these tests fail loudly if any kernel call stops compiling.
  * Also proves two instances of the same expression coexist in one
  * generated function (the historical duplicate-local hazard).
  */
class CodegenSpec extends AnyFunSuite {
  import TestSession._

  private def noFallback[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("all hash/vector kernels compile and run under codegen-only") {
    noFallback {
      val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
      val out = docs.select(
        col("doc_id"),
        TextOps.charShingleHashes(col("text"), 5).as("sh"),
        TextOps.wordNgramHashes(col("text"), 3).as("ng"),
        TextOps.fingerprint(col("text")).as("fp"))
        .select(col("doc_id"),
          TextOps.minhashFromHashes(col("sh"), 64).as("sig"),
          TextOps.simhashBlocks(col("ng")).as("blocks"),
          col("fp"))
      assert(out.count() > 0)
    }
  }

  test("two minhash columns in ONE projection codegen together") {
    noFallback {
      val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
      // both signatures + both shingle sets in the same generated
      // function — duplicate generated locals would fail Janino here
      val out = docs.select(
        TextOps.minhashFromHashes(TextOps.charShingleHashes(col("text"), 4), 16).as("sig_a"),
        TextOps.minhashFromHashes(TextOps.charShingleHashes(col("text"), 6), 16).as("sig_b"))
      assert(out.count() > 0)
    }
  }

  test("cosine / hyperplane / centroid kernels under codegen-only") {
    noFallback {
      val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")
      val planes = Similarity.hyperplanes(nBits = 4, dim = 64)
      val cs = Similarity.centroidSeeds(emb, "embedding", "vec_id", 8)
      val out = Similarity.ivfAssign(emb, "embedding", "vec_id", cs)
        .withColumn("b", Similarity.lshBucket(col("embedding"), planes))
        .withColumn("c", Similarity.cosine(col("embedding"), col("embedding")))
      assert(out.filter(col("c") > 0.999).count() > 0)
    }
  }

  test("cosine: zero norm yields 0.0, dimension mismatch fails loudly") {
    import spark.implicits._
    val z = Seq((Array(0f, 0f), Array(1f, 2f))).toDF("a", "b")
    val zv = z.select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    assert(zv == 0.0, s"zero-norm cosine must be 0.0, got $zv")
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }
}
