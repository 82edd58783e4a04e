package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity
import graft.plans.Quantization
import graft.sources.Catalog

/** Measured contracts for int8 embedding quantization: bounded
  * per-pair cosine error and high top-k recall vs the exact float
  * path — the properties that justify shipping the 4×-smaller
  * search corpus.
  */
class QuantizationSpec extends AnyFunSuite {
  import TestSession._

  private def emb = Catalog.table(spark, sfDir, "embeddings")

  test("int8 cosine tracks float cosine within 0.02 per pair") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
    val both = emb.limit(200)
      .crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("__qv")).as("exact"),
        Quantization.int8Cosine(
          Quantization.quantizeInt8(col("embedding")),
          Quantization.quantizeInt8(col("__qv"))).as("quant"))
      .collect()
    both.foreach { r =>
      val err = math.abs(r.getDouble(0) - r.getDouble(1))
      assert(err < 0.02, s"cosine drift $err (exact=${r.getDouble(0)})")
    }
  }

  test("quantized top-10 recall vs exact float top-10 is at least 0.8") {
    val query = emb.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", query, "embedding", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.int8TopK(emb, "embedding", "vec_id", query, "embedding", 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("quantization is scale-invariant (cosine scales cancel)") {
    val scaled = emb.limit(50)
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x => x * lit(3.5f)).as("scaled"))
    val rows = scaled.select(
      Quantization.int8Cosine(
        Quantization.quantizeInt8(col("embedding")),
        Quantization.quantizeInt8(col("scaled")))).collect()
    rows.foreach(r => assert(r.getDouble(0) > 0.999,
      s"vector vs its scalar multiple should quantize identically, got ${r.getDouble(0)}"))
  }

  test("int8 search plan stays shuffle-free on the corpus (broadcast + TakeOrdered)") {
    val query = emb.filter(col("vec_id") === 0)
    val plan = Similarity.int8TopK(emb, "embedding", "vec_id", query, "embedding", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
    assert(!plan.contains("Exchange hashpartitioning"),
      "corpus must not hash-shuffle for a broadcast query")
  }
}
