package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SemDedup

/** SemDeDup contracts (Abbas et al. 2023): the greedy chain
  * semantics, planted-duplicate removal, no-op on a dup-free corpus,
  * and partition-count invariance.
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private lazy val emb = graft.sources.Catalog.table(spark, sfDir, "embeddings")

  test("greedyKeep: chain a~b, b~c, a!~c keeps a AND c (paper greedy, not neighbor-dominance)") {
    val th = math.toRadians(20)
    def v(angle: Double) = Array(math.cos(angle).toFloat, math.sin(angle).toFloat)
    // cos(20°)=0.94 > 0.9 ; cos(40°)=0.77 < 0.9
    val kept = SemDedup.greedyKeep(Array(v(0), v(th), v(2 * th)), tau = 0.9)
    assert(kept.toSeq === Seq(true, false, true))
    // sanity: a tight pair collapses to its first (highest-priority) member
    assert(SemDedup.greedyKeep(Array(v(0), v(0.001)), tau = 0.9).toSeq === Seq(true, false))
  }

  test("planted same-direction duplicates are removed, one survivor per pair") {
    val planted = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val base = emb.select(col("vec_id"), col("embedding"))
    val nPlanted = planted.count()
    val corpus = base.unionByName(planted)
    val out = SemDedup.semDedup(corpus, "embedding", "vec_id", k = 8, tau = 0.95)
    val total = out.count()
    val keptN = out.filter(col("kept")).count()
    assert(total === base.count() + nPlanted)
    // every planted pair loses exactly one member; the natural corpus
    // has no pair above 0.95 (measured max ≈ 0.51), so nothing else drops
    assert(keptN === total - nPlanted)
    // exactly ONE of each planted pair {id, id+10⁶} survives (which
    // one depends on sub-ulp centroid-cosine differences from the
    // ×1.001f perturbation — the keep-priority rule decides)
    val keptIds = out.filter(col("kept")).select("id").as[Long].collect().toSet
    val origIds = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select("vec_id").as[Long].collect()
    assert(origIds.forall(id => keptIds.contains(id) ^ keptIds.contains(id + 1000000L)))
  }

  test("dup-free corpus at high tau is a no-op") {
    val out = SemDedup.semDedup(emb, "embedding", "vec_id", k = 8, tau = 0.99)
    assert(out.filter(!col("kept")).count() === 0)
  }

  test("kept set is invariant to input partitioning (pinned centroids)") {
    // the kmeans SEEDS are scan-order-bounded by design (no global
    // sort at 100 TB), so pin the fit once and prove everything
    // downstream — assignment, priority sort, greedy — is invariant
    val cs = graft.llm.Clustering.kmeans(emb, "embedding", "vec_id", k = 8, maxIters = 3).centroids
    val a = SemDedup.semDedup(emb.repartition(3), "embedding", "vec_id", cs, tau = 0.35)
      .filter(col("kept")).select("id").as[Long].collect().toSet
    val b = SemDedup.semDedup(emb.repartition(17), "embedding", "vec_id", cs, tau = 0.35)
      .filter(col("kept")).select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
