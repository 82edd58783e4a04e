package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Bpe

/** Contracts for distributed BPE merge learning: the Sennrich et al.
  * worked example's merge order, deterministic lexicographic
  * tie-breaks, greedy left-to-right application over consecutive
  * pairs, and train/tokenize consistency.
  */
class BpeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("Sennrich vocabulary learns (e,s) then (es,t)") {
    // {low:5, lower:2, newest:6, widest:3} — (e,s) and (s,t) tie at 9,
    // lexicographic break picks (e,s); after the rewrite (es,t) is 9
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.train(hist, nMerges = 2)
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L)), s"got $merges")
  }

  test("tokenize applies merges in rank order") {
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.train(hist, nMerges = 2)
    val got = Seq("newest").toDF("w")
      .select(Bpe.tokenize(col("w"), merges)).head().getSeq[String](0)
    assert(got == Seq("n", "e", "w", "est"), s"got $got")
  }

  test("consecutive pairs merge greedily left-to-right in one round") {
    val hist = Seq(("aaaa", 1L)).toDF("word", "cnt")
    val merges = Bpe.train(hist, nMerges = 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    val got = Seq("aaaa").toDF("w")
      .select(Bpe.tokenize(col("w"), merges)).head().getSeq[String](0)
    assert(got == Seq("aa", "aa"), s"greedy application broken: $got")
  }

  test("corpus training is deterministic and merges have non-increasing frequency") {
    val hist = Bpe.wordHistogram(
      graft.sources.Catalog.table(spark, sfDir, "documents"), "text")
      .cache()
    val a = Bpe.train(hist, nMerges = 6)
    val b = Bpe.train(hist, nMerges = 6)
    hist.unpersist()
    assert(a == b, "same histogram must learn the same merge table")
    a.sliding(2).foreach { case Seq(x, y) =>
      assert(y.freq <= x.freq, s"merge frequency rose: $x -> $y")
    }
  }
}
