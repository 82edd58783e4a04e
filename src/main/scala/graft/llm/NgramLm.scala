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

  /** Largest model the driver will materialize: 2²⁴ distinct train
    * bigrams (~0.5 GiB of map). A trusted corpus past this bound
    * couldn't be broadcast to executors either — shard the model and
    * fall back to a key-partitioned join at that point.
    */
  val MaxModelEntries: Int = 1 << 24

  /** Cross-entropy per document: (id, n_bigrams, ce_e9) with the
    * score snapped to a 1e-9 grid (ln is libm-dependent; the f28
    * discipline). `trainFilter` selects the trusted slice.
    */
  def score(docs: DataFrame, id: String, text: String,
      trainFilter: Column): DataFrame = {
    import graft.plans.{BigramLmStats, LongLongMap, SlidingNgramHash64s}
    import graft.plans.HashExpressions.{columnOf, exprOf}
    val spark = docs.sparkSession
    // 64-bit gram hashes stand in for gram strings (the p05 trade;
    // collision odds ≪1e-5 at 10⁷ distinct grams). The model derives
    // from the TRAIN slice only — CCNet's trusted corpus is small and
    // FIXED-SIZE regardless of how big the scored corpus grows — so it
    // collapses to two Long→Long maps built on the driver and
    // broadcast once. Scoring is then a single codegen'd kernel call
    // per document: tokenize, probe, sum — no explode of corpus-size
    // gram rows, no joins, no per-doc re-aggregation shuffle. (The
    // previous broadcast-JOIN formulation shipped the same model bytes
    // but paid explode + 2 probes-as-joins + groupBy(doc) on
    // corpus×grams rows: 30 s → ~4 s at sf10.)
    val train = docs.filter(trainFilter)
      .select(columnOf(SlidingNgramHash64s(exprOf(col(text)), 1)).as("__wm"),
        columnOf(SlidingNgramHash64s(exprOf(col(text)), 2)).as("__bm"))
    // (bigram hash, first-word hash, count) — the first word of bigram
    // i is unigram i, so both keys come from the same two per-doc
    // arrays. Collect is bounded by the trusted-slice gram vocabulary
    // (MaxModelEntries guard), NOT the corpus.
    val c12Rows = train
      .select(posexplode(col("__bm")).as(Seq("__i", "__bh")), col("__wm"))
      .select(col("__bh"), element_at(col("__wm"), col("__i") + 1).as("__w1h"))
      .groupBy(col("__bh"), col("__w1h")).agg(count(lit(1)).as("__c"))
      .limit(MaxModelEntries + 1)
      .collect()
    require(c12Rows.length <= MaxModelEntries,
      s"bigram-LM model exceeds $MaxModelEntries entries; shard the model " +
        "and use a key-partitioned join instead of a broadcast probe")
    val c1Agg = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    c12Rows.foreach { r =>
      // c1 = Σ c12 over the conditioning word — exactly the oracle's
      // c1 CTE, folded driver-side from the rows already in hand
      c1Agg.merge(r.getLong(1), r.getLong(2), (a, b) => a + b)
    }
    // vocabulary of the train slice (all unigram positions)
    val vocab = train.select(explode(col("__wm")).as("t")).distinct().count().toDouble

    // The maps carry PRECOMPUTED per-key log terms as double bits,
    // not raw counts: present bigram → its full term
    // -ln((c12+1)/(c1+V)); seen-w1 miss → -ln(1/(c1+V)). The hot
    // loop (HashKernels.bigramLmStats) then runs zero Math.log calls
    // and skips the c1 probe on bigram hits. BIT-IDENTICAL to
    // computing in the loop: each precomputed term keeps the exact
    // expression shape of the original/oracle formula — including the
    // miss case's rounding 1/(c1+V) division, which -ln(1/x) ≠ ln(x)
    // at the ulp level — so the same libm sees the same argument.
    // Neither stored value can be the 0L bit pattern (+0.0): every
    // term is strictly positive (c12 ≤ c1 < c1+V-1 and c1+V ≥ 2).
    val c12 = new LongLongMap(c12Rows.length)
    c12Rows.foreach { r =>
      val term = -Math.log((r.getLong(2) + 1.0) / (c1Agg.get(r.getLong(1)) + vocab))
      c12.put(r.getLong(0), java.lang.Double.doubleToLongBits(term))
    }
    val c1 = new LongLongMap(c1Agg.size)
    c1Agg.forEach((k, v) =>
      c1.put(k, java.lang.Double.doubleToLongBits(-Math.log(1.0 / (v + vocab)))))

    val bc12 = spark.sparkContext.broadcast(c12)
    val bc1 = spark.sparkContext.broadcast(c1)
    docs.select(col(id),
        columnOf(BigramLmStats(exprOf(col(text)), bc12, bc1, vocab)).as("__st"))
      .filter(col("__st").isNotNull)
      .select(col(id), element_at(col("__st"), 1).as("n_bigrams"),
        element_at(col("__st"), 2).as("ce_e9"))
  }

  /** head/middle/tail terciles of (ce_e9, id) order — NTILE(3)'s
    * exact bucket arithmetic over a distributed rank (no global
    * window, no single-partition stage).
    */
  def terciles(scored: DataFrame, id: String, parts: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // persist the scored projection (3 longs/doc, never the text)
    // BEFORE the range shuffle: RangePartitioning executes its child
    // TWICE (bounds sample + the shuffle itself), and without this the
    // child is the full tokenize+probe scoring scan — one whole corpus
    // pass wasted (measured: p12 full 8.3 → ~4.8 s at sf10)
    val pre = scored.select(col(id).cast("long"), col("ce_e9").cast("long"),
        col("n_bigrams").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ds = pre
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
    // The persisted parent is released by the ContextCleaner once the
    // returned frame is unreferenced. An eager localCheckpoint of the
    // result would free it sooner but costs a full extra materialize
    // pass (measured +1.7 s at sf10) — not worth it for a parent that
    // is ids+scores only (24 B/doc), never the corpus text.
    spark.createDataFrame(ranked).toDF(id, "n_bigrams", "ce_e9", "bucket")
  }
}
