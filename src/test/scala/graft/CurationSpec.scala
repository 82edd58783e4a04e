package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation
import graft.sources.Catalog

/** Contracts for the corpus-curation stages that the SQL oracles
  * can't express: partition-count invariance of the distributed
  * prefix sum, stability of hash-based assignment under corpus
  * edits, and the mixture/cap bounds.
  */
class CurationSpec extends AnyFunSuite {
  import TestSession._

  private def docs = Catalog.table(spark, sfDir, "documents")

  test("packOffsets equals the single-window prefix sum at any partition count") {
    val tok = docs.select(col("doc_id"), (col("n_chars") % 97 + 1).as("tokens"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val expected = tok
      .select(col("doc_id"), coalesce(sum("tokens").over(w), lit(0L)).as("start"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Curation.packOffsets(tok, "doc_id", "tokens", parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"prefix sums diverge at parts=$parts")
    }
  }

  test("packOffsets total equals the sum of tokens and starts are strictly increasing") {
    val tok = docs.select(col("doc_id"), (col("n_chars") % 97 + 1).as("tokens"))
    val rows = Curation.packOffsets(tok, "doc_id", "tokens", 8)
      .orderBy("doc_id").collect()
    val totalTokens = tok.agg(sum("tokens")).head().getLong(0)
    val last = rows.last
    assert(last.getLong(2) + last.getLong(1) == totalTokens)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
        "each start must be the previous start + previous tokens")
    }
  }

  test("hashSplit assignment is per-doc stable under corpus edits") {
    val full = docs.select(col("doc_id"),
      Curation.hashSplit(docs, col("doc_id")).as("split"))
    val half = docs.where(col("doc_id") % 2 === 0)
    val halfSplit = half.select(col("doc_id"),
      Curation.hashSplit(half, col("doc_id")).as("split"))
    val fullMap = full.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    halfSplit.collect().foreach { r =>
      assert(fullMap(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} flipped split when other docs were removed")
    }
    val frac = full.where(col("split") === "train").count().toDouble /
      full.count().toDouble
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac far from 205/256")
  }

  test("mixtureSample accept rate tracks min(1, w*total/cnt) per source") {
    val sampled = Curation.mixtureSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.04), defaultWeight = 0.01)
    val perSrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = perSrc.values.sum.toDouble
    val kept = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, w) <- Seq("src0" -> 0.04, "src7" -> 0.01)) {
      val rate = math.min(1.0, w * total / perSrc(src))
      val got = kept.getOrElse(src, 0L).toDouble / perSrc(src)
      // 16-bit hash threshold: binomial noise at n=25 docs is wide,
      // just require the right ballpark and the cap
      assert(got <= 1.0 && math.abs(got - rate) < 0.35,
        s"$src kept fraction $got vs target rate $rate")
    }
  }

  test("sourceCap keeps at most K per source and exactly the quality top-K") {
    val capped = Curation.sourceCap(docs, col("source"), cap = 5,
      col("n_chars").desc, col("doc_id"))
    val sizes = capped.groupBy("source").count().collect()
    sizes.foreach(r => assert(r.getLong(1) <= 5, s"${r.getString(0)} over cap"))
    // top-5 of one source by (n_chars desc, doc_id) must match exactly
    val src = "src3"
    val expect = docs.where(col("source") === src)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(5).select("doc_id").collect().map(_.getLong(0)).toSet
    val got = capped.where(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("contamination: planted eval copy is flagged, disjoint text is not") {
    import spark.implicits._
    import graft.plans.{HashExpressions => H, WordNgramHashes}
    // doc 0 is the "benchmark"; doc 5 copies a span of it verbatim,
    // doc 9 shares no 3-gram with it (eval slice = doc_id % 97 == 0)
    val eval = "the quick brown fox jumps over the lazy dog near the river bank"
    val dirty = "intro words then the quick brown fox jumps over something else"
    val clean = "completely different content with no overlapping trigrams here at all"
    val df = Seq((0L, eval), (5L, dirty), (9L, clean)).toDF("doc_id", "text")
    val dg = df.select(col("doc_id"),
      explode(H.columnOf(WordNgramHashes(H.exprOf(col("text")), 3))).as("gh"))
    val eg = dg.filter(col("doc_id") % 97 === 0).select(col("gh").as("egh")).distinct()
    val hits = dg.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(eg), col("gh") === col("egh"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("egh").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(5L) >= 3, s"planted copy under-detected: ${hits(5L)} shared grams")
    assert(hits(9L) == 0, "disjoint doc falsely flagged")
  }

  test("dsirMasses: target-like docs are selected and out-rank dissimilar ones") {
    import spark.implicits._
    // target corpus speaks vocabulary A; doc 10 speaks A (should be
    // kept, high log-weight), doc 11 speaks disjoint vocabulary B
    // (zero target mass → never selected, lower log-weight)
    val a = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    val b = "xray yankee zulu quebec xray yankee zulu quebec xray yankee"
    val df = Seq(
      (1L, a, true), (2L, a, true), (3L, a, true),
      (10L, a, false), (11L, b, false)
    ).toDF("doc_id", "text", "is_t")
    val got = Curation.dsirMasses(df, col("doc_id"), col("text"), col("is_t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val (t10, _, w10, sel10) = got(10L)
    val (t11, _, w11, sel11) = got(11L)
    assert(sel10 && !sel11, s"selection flags wrong: $got")
    assert(t10 > 0 && t11 == 0, "target mass should reflect vocabulary overlap")
    assert(w10 > w11, s"log-weight should rank the target-like doc higher ($w10 vs $w11)")
  }
}
