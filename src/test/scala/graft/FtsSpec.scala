package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.FullText

/** BM25 full-text search: the persisted bucket-partitioned index must
  * rank identically to the index-free scoring path, the scan must be
  * partition-pruned to the query terms' buckets, and the scoring math
  * is pinned against a hand-computed BM25 value.
  */
class FtsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join window spark"),
    (2L, "join table scan"),
    (3L, "spark spark spark filter"),
    (4L, "window agg sort merge batch"),
    (5L, "scan filter value"),
    (6L, "join join spark window table")
  ).toDF("doc_id", "text")

  test("index search == index-free BM25 on every ranked doc") {
    val dir = Files.createTempDirectory("fts").toString
    FullText.writeFtsIndex(docs, "doc_id", "text", dir, nBuckets = 8)
    val brute = FullText.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 10).as[(Long, Long)].collect().toSeq
    val indexed = FullText.searchFtsIndex(spark, dir,
      Seq("spark", "join"), k = 10, nBuckets = 8).as[(Long, Long)].collect().toSeq
    assert(indexed == brute, s"indexed=$indexed brute=$brute")
    assert(brute.nonEmpty && brute.map(_._1).contains(3L))
  }

  test("hand-computed BM25 value matches (doc 3, term spark)") {
    // corpus: N=6, dl = [4,3,4,5,3,5] → avgdl = 4.0
    // df(spark)=3 → idf = ln(1 + (6-3+0.5)/(3+0.5)) = ln(2)
    // doc 3: tf=3, dl=4 → tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    //   = 3*2.2 / (3 + 1.2*(0.25+0.75*1.0)) = 6.6/4.2
    val expected = math.floor(
      math.log(2.0) * 6.6 / 4.2 * 1e6 + 0.5).toLong
    val got = FullText.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .filter(col("id") === 3L).select("score_micro").as[Long].head()
    assert(got == expected, s"got $got expected $expected")
  }

  test("search reads only the query terms' bucket partitions") {
    val dir = Files.createTempDirectory("fts").toString
    FullText.writeFtsIndex(docs, "doc_id", "text", dir, nBuckets = 8)
    val q = FullText.searchFtsIndex(spark, dir, Seq("spark"), k = 10, nBuckets = 8)
    val scan = q.queryExecution.executedPlan.toString
    // the bucket predicate must be a partition filter on the postings
    // scan (prints as e.g. "PartitionFilters: [isnotnull(bucket#n), (bucket#n = 2)]")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(scan).isDefined,
      s"expected partition-pruned postings read:\n$scan")
  }

  test("portable top-k ranks like the micro-unit path and emits integer components") {
    val r = FullText.bm25TopKPortable(docs, "doc_id", "text",
      Seq("spark", "join", "vector"), k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // same ranking as the multi-term case below: doc1, doc6, doc3
    assert(r.map(_._2) == Seq(1L, 6L, 3L), r.mkString(","))
    assert(r.map(_._1) == Seq(1L, 2L, 3L)) // rank positions
    // doc1: tf(spark)=2 + tf(join)=1 over dl=4; doc3: spark only
    assert(r.head == ((1L, 1L, 2L, 3L, 4L)), r.head.toString)
    assert(r(2) == ((3L, 3L, 1L, 3L, 4L)), r(2).toString)
  }

  test("multi-term ranking follows the hand-computed BM25 order") {
    // 'vector' appears nowhere → contributes nothing. With ln(2) idf
    // for both terms (df=3 each) the per-doc totals are
    //   doc1: tf(spark)=2,tf(join)=1, dl=4 → (1.375+1.0)·ln2
    //   doc6: tf(join)=2,tf(spark)=1, dl=5 → (1.285+0.907)·ln2
    //   doc3: tf(spark)=3, dl=4           → 1.571·ln2
    val r = FullText.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "vector"), k = 3).as[(Long, Long)].collect()
    assert(r.map(_._1).toSeq == Seq(1L, 6L, 3L), r.mkString(","))
  }
}
