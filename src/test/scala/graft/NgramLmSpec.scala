package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.NgramLm

/** CCNet bigram-LM filtering contracts: exact add-1 arithmetic on a
  * worked example, in-domain < out-of-domain ordering, the tercile
  * split's equivalence to the NTILE(3) window spelling, and
  * partition invariance of the distributed rank.
  */
class NgramLmSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("worked example: add-1 bigram cross-entropy is exact") {
    // train: "a b a b a b" → bigrams: ab, ba, ab, ba, ab
    //   c(a b)=3, c(b a)=2 ; c1(a)=3, c1(b)=2 ; V = 2
    // score "a b": −ln((3+1)/(3+2)) = ln(5/4)
    // score "x y": −ln((0+1)/(0+2)) = ln 2
    val docs = Seq(
      (0L, "a b a b a b", "train"),
      (1L, "a b", "test"),
      (2L, "x y", "test")).toDF("doc_id", "text", "source")
    val scored = NgramLm.score(docs, "doc_id", "text", col("source") === "train")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def e9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    assert(scored(1L) === ((1L, e9(math.log(5.0 / 4.0)))))
    assert(scored(2L) === ((1L, e9(math.log(2.0)))))
    // the train doc scores itself: (3·(−ln(4/5)) + 2·(−ln(3/4)))/5
    assert(scored(0L)._1 === 5L)
    assert(scored(0L)._2 === e9((3 * math.log(5.0 / 4.0) + 2 * math.log(4.0 / 3.0)) / 5))
    // in-domain text is more probable than OOV text
    assert(scored(1L)._2 < scored(2L)._2)
  }

  test("terciles match the NTILE(3) window spelling exactly") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val scored = NgramLm.score(docs, "doc_id", "text", col("source") === "src0")
    scored.persist()
    val dist = NgramLm.terciles(scored, "doc_id")
      .select(col("doc_id"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ce_e9"), col("doc_id"))
    val win = scored.select(col("doc_id"),
      when(ntile(3).over(w) === 1, "head")
        .when(ntile(3).over(w) === 2, "middle").otherwise("tail").as("bucket"))
    val d = dist.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ww = win.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === ww)
    scored.unpersist()
  }

  test("tercile assignment is invariant to partitioning") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val scored = NgramLm.score(docs, "doc_id", "text", col("source") === "src0")
    val a = NgramLm.terciles(scored.repartition(3), "doc_id", parts = 5)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val b = NgramLm.terciles(scored.repartition(11), "doc_id", parts = 32)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(a === b)
    assert(a.values.toSet === Set("head", "middle", "tail"))
  }
}
