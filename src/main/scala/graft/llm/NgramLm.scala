package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality filtering (Wenzek et
  * al. 2019, "CCNet: Extracting high quality monolingual datasets
  * from web crawl data" — §4.3: score every document under an LM
  * trained on a trusted corpus, then split the corpus into
  * head/middle/tail perplexity terciles).
  *
  * The LM here is a word-BIGRAM model with add-1 smoothing trained on
  * a designated source slice:  P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V),
  * c(w₁) summed over bigram contexts so probabilities normalize, V =
  * the train slice's unigram vocabulary. A document's score is its
  * mean negative log-probability (cross-entropy, nats/bigram).
  *
  * Scale shape (100 TB): training is two aggregations over the TRAIN
  * slice only; scoring is one explode + two key joins against the
  * model tables (Catalyst broadcasts them when the trusted slice is
  * small — CCNet's Wikipedia LM case) + one per-doc aggregate. The
  * tercile split deliberately does NOT use a global window: NTILE
  * over a whole corpus forces a single partition. Instead the rank
  * comes from the p04 machinery — range-partition by the sort key,
  * count per partition, exchange O(#partitions) offsets — and the
  * tercile boundaries are NTILE's exact arithmetic applied to that
  * rank, so the result is bit-identical to the window spelling at
  * any cluster size.
  */
object NgramLm {

  /** Cross-entropy per document: (id, n_bigrams, ce_e9) with the
    * score snapped to a 1e-9 grid (ln is libm-dependent; the f28
    * discipline). `trainFilter` selects the trusted slice.
    */
  def score(docs: DataFrame, id: String, text: String,
      trainFilter: Column): DataFrame = {
    import graft.plans.SlidingNgramMd5s
    import graft.plans.HashExpressions.{columnOf, exprOf}
    // 16-byte gram digests stand in for gram strings (collision odds
    // ≪ 2⁻¹⁰⁰ at corpus scale): one fused pass per doc replaces the
    // interpreted split + transform(concat) gram build, count tables
    // and joins carry fixed-width binary keys, and — the scale story —
    // the model tables derive from the TRAIN slice only, so they
    // BROADCAST (CCNet's small-trusted-corpus case) and the
    // corpus-size bigram rows never cross a shuffle: scan → two
    // broadcast probes → per-doc partial aggregate.
    val marked = docs.select(col(id), trainFilter.as("__train"),
      columnOf(SlidingNgramMd5s(exprOf(col(text)), 1)).as("__wm"),
      columnOf(SlidingNgramMd5s(exprOf(col(text)), 2)).as("__bm"))
    // (doc, bigram digest, first-word digest) — the first word of
    // bigram i is unigram i, so both keys come from the same two
    // per-doc arrays
    val bg = marked
      .select(col(id), col("__train"), col("__wm"),
        posexplode(col("__bm")).as(Seq("__i", "__bh")))
      .select(col(id), col("__train"), col("__bh"),
        element_at(col("__wm"), col("__i") + 1).as("__w1h"))

    val c12 = bg.filter(col("__train")).groupBy(col("__bh"), col("__w1h"))
      .agg(count(lit(1)).as("__c12"))
    val c1 = c12.groupBy(col("__w1h")).agg(sum(col("__c12")).as("__c1"))
    // vocabulary of the train slice (all unigram positions)
    val vocab = marked.filter(col("__train"))
      .select(explode(col("__wm")).as("t")).distinct().count().toDouble

    bg.join(broadcast(c12.select(col("__bh"), col("__c12"))), Seq("__bh"), "left")
      .join(broadcast(c1), Seq("__w1h"), "left")
      .select(col(id),
        (-log((coalesce(col("__c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("__c1"), lit(0L)) + lit(vocab)))).as("__nl"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("__nl")) / count(lit(1)) * 1e9 + 0.5).cast("long").as("ce_e9"))
  }

  /** head/middle/tail terciles of (ce_e9, id) order — NTILE(3)'s
    * exact bucket arithmetic over a distributed rank (no global
    * window, no single-partition stage).
    */
  def terciles(scored: DataFrame, id: String, parts: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val ds = scored.select(col(id).cast("long"), col("ce_e9").cast("long"),
        col("n_bigrams").cast("long"))
      .as[(Long, Long, Long)]
      .repartitionByRange(parts, col("ce_e9"), col(id))
      .sortWithinPartitions(col("ce_e9"), col(id))
    val rdd = ds.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    // NTILE(3): the first n%3 buckets hold n/3+1 rows, the rest n/3
    val q = n / 3; val r = n % 3
    val b1 = q + (if (r >= 1) 1L else 0L)
    val b2 = b1 + q + (if (r >= 2) 1L else 0L)
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = rdd.mapPartitionsWithIndex { case (i, it) =>
      var rk = bc.value(i)
      it.map { case (docId, ce, nb) =>
        val b = if (rk < b1) "head" else if (rk < b2) "middle" else "tail"
        rk += 1
        (docId, nb, ce, b)
      }
    }
    spark.createDataFrame(ranked).toDF(id, "n_bigrams", "ce_e9", "bucket")
  }
}
