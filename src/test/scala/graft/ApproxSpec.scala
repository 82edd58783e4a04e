package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Accuracy bounds for the approximate operators (no SQL oracle —
  * engine-specific sketches / index structures).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("approx_count_distinct within 10% of exact") {
    val rows = SparkEntry.queries("q43_approx_distinct")(spark, sfDir)
      .select("approx_orders", "exact_orders").as[(Long, Long)].collect()
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.10,
        s"approx=$approx exact=$exact")
    }
  }

  test("IVF ANN: self in results, sane overlap with brute force") {
    val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
    val ivf = Similarity.ivfTopK(emb, "embedding", "vec_id", q, "embedding",
      k = 10, maxCentroids = 16, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, "embedding", 10)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.contains(0L), "query vector must find itself")
    assert((ivf & brute).size >= 2, s"ivf=$ivf brute=$brute")
  }

  test("IVF assignment covers every vector exactly once") {
    val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")
    val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id", 16)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
  }

  test("persisted IVF index with full probe equals brute force") {
    val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.writeIvfIndex(emb, "embedding", "vec_id", maxCentroids = 16, dir)
    // probing EVERY list makes the index search exhaustive — results
    // must match brute force exactly (same ranking, same tie-break)
    val full = Similarity.searchIvfIndex(spark, dir, q, "embedding",
        "vec_id", "embedding", k = 10, nprobe = 16)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, "embedding", 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == brute, s"full-probe $full vs brute $brute")
    // a narrow probe still finds the query vector itself
    val narrow = Similarity.searchIvfIndex(spark, dir, q, "embedding",
        "vec_id", "embedding", k = 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(narrow.contains(0L))
  }
}
