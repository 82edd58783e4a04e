package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation stages of a training-data pipeline: deterministic
  * splits, mixture re-weighting, per-source caps, and GPT-style
  * sequence packing. All decisions are pure functions of (stable id,
  * md5) — NO rand(): re-running the pipeline on the same corpus, on
  * any cluster size, reproduces byte-identical train/val/test sets,
  * which is what makes 100 TB runs auditable and resumable. Every op
  * here is either map-only or a standard keyed aggregate — nothing
  * collects data to the driver except per-PARTITION counters (one
  * long each) in [[packOffsets]].
  */
object Curation {

  /** First two hex chars of md5(id) — 256 stable buckets, portable
    * across engines (md5 is md5 everywhere, unlike engine hash()).
    */
  private def bucket2(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 2)

  /** Deterministic train/val/test assignment: doc follows its md5
    * bucket forever — adding or removing OTHER docs never flips it
    * (contrast: rand() or ntile re-deal on every run / every
    * repartition). Thresholds are hex-string compares over 256
    * buckets: 'cd' ⇒ 205/256 ≈ 80%, 'e6' ⇒ next 25/256 ≈ 10%.
    */
  def hashSplit(df: DataFrame, id: Column,
      trainUpper: String = "cd", valUpper: String = "e6"): Column = {
    val b = bucket2(id, "split:")
    when(b < lit(trainUpper), "train")
      .when(b < lit(valUpper), "val")
      .otherwise("test")
  }

  /** Mixture re-weighting: per-source accept rate
    * min(1, weight·total/count) hits the requested source mix in
    * expectation; the accept decision is a per-doc md5 threshold, so
    * it's exact-reproducible and embarrassingly parallel. The counts
    * come from one keyed aggregate whose result (#sources rows) rides
    * back as BROADCAST joins — no `COUNT(*) OVER ()`, which Spark
    * executes as a single-partition window. `weights` maps source →
    * target share; sources not listed get `defaultWeight`.
    */
  def mixtureSample(df: DataFrame, id: Column, source: Column,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, wt)) =>
      when(source === lit(s), lit(wt)).otherwise(acc)
    }
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__cnt"))
    val totalDf = counts.agg(sum(col("__cnt")).as("__total"))
    val rate = least(lit(1.0),
      w * col("__total").cast("double") / col("__cnt").cast("double"))
    // first 4 hex chars of md5 as a uniform 16-bit integer
    val u16 = conv(substring(md5(concat(lit("mix:"), id.cast("string"))), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(counts), source === col("__src"))
      .crossJoin(broadcast(totalDf))
      .withColumn("__u16", u16)
      .withColumn("__thr", floor(rate * lit(65536.0)))
      .where(col("__u16") < col("__thr"))
      .drop("__src", "__cnt", "__total", "__u16", "__thr")
  }

  /** Per-source document cap (the "no domain may dominate" rule):
    * keep the top `cap` docs of each source by the given quality
    * ordering. One hash-partition window; at scale the heavy groups
    * are bounded by the cap itself after the rank filter.
    */
  def sourceCap(df: DataFrame, source: Column, cap: Int,
      quality: Column*): DataFrame = {
    val w = Window.partitionBy(source).orderBy(quality: _*)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** GPT-style sequence packing: concatenate the corpus in stable id
    * order and cut fixed `seqLen`-token sequences, so each doc spans
    * chunks [start/seqLen, (start+tokens-1)/seqLen]. The global
    * exclusive prefix sum is computed WITHOUT a single-partition
    * window (the naive `SUM OVER (ORDER BY id)` serializes the whole
    * corpus through one task): range-partition by id, one long of
    * per-partition totals to the driver (O(#partitions), the
    * zipWithIndex pattern), then a second map-only pass starts each
    * partition at its broadcast offset.
    *
    * Input must have unique ids; rows with tokens ≤ 0 carry start but
    * no chunks. Output: (id, tokens, start) with id named as the
    * input column.
    */
  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw doc
    * by how much its hashed-n-gram feature mass looks like a small
    * TARGET corpus vs the raw corpus, then keep the docs whose target
    * affinity exceeds their raw affinity.
    *
    * Fidelity vs oracle-safety: real DSIR weights are
    * Σ log(p_target[b]/p_raw[b]) — float logs that no two engines sum
    * identically. The selection RULE here is re-arranged to exact
    * integer cross-multiplication: with per-doc bucket masses
    * t_mass = Σ_grams cnt_target[bucket], r_mass = Σ_grams
    * cnt_raw[bucket] and corpus totals T, R, keep docs where
    * t_mass·R > r_mass·T (i.e. mean target affinity above the
    * corpus-neutral line). All BIGINT — hash-stable across engines.
    * The float log-ratio weight is still exposed (`dsir_logw`) for
    * ranking consumers; it just isn't part of the oracle contract.
    *
    * Buckets are the first two hex chars of md5(gram) — 256 stable
    * buckets, portable across engines like [[hashSplit]] (the fused
    * kernel buckets by the digest's first BYTE, which IS the first two
    * hex chars). Scale posture: the corpus-size gram table never
    * exists — one fused pass (plans/HashKernels.dsirBucketCounts)
    * yields a (doc, long[256]) histogram row per doc; the global
    * bucket table is a 256-group aggregate whose shuffle is
    * (#partitions × 256) rows after map-side combine, collected
    * driver-side (EXACTLY 256 rows — bounded by construction, like
    * the IVF centroid seeds); the per-doc masses are then pure
    * dot-product projections against the 256-entry weight vectors —
    * zero joins, zero per-doc aggregation. Was: gram explode (rows ≈
    * corpus words) + two groupBys + broadcast join; measured at sf10
    * 210 s → the fused form is one cached histogram pass + one
    * projection.
    */
  def dsirMasses(df: DataFrame, id: Column, text: Column,
      isTarget: Column, gramN: Int = 2): DataFrame = {
    import graft.plans.{DotWeightsDouble, DotWeightsLong, DsirBucketCounts}
    import graft.plans.HashExpressions.{columnOf, exprOf}
    // one md5 pass over the corpus feeds BOTH the bucket table and the
    // masses; checkpoint pins the histogram (500k × ~2 KB per million
    // docs — small) so the pass runs once
    val cnts = df.select(id.as("__id"), isTarget.as("__t"),
        columnOf(DsirBucketCounts(exprOf(text), gramN)).as("__c"))
      .localCheckpoint(true)
    // global bucket table: 256 groups, map-side partial aggregation
    val bucketRows = cnts
      .select(col("__t"), posexplode(col("__c")).as(Seq("__b", "__n")))
      .filter(col("__n") > 0)
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), col("__n")).otherwise(0L)).as("__ct"),
        sum(col("__n")).as("__cr"))
      .collect() // exactly ≤256 rows — driver-bounded by construction
    val ct = new Array[Long](256)
    val cr = new Array[Long](256)
    bucketRows.foreach { r =>
      val b = r.getInt(0)
      ct(b) = r.getLong(1)
      cr(b) = r.getLong(2)
    }
    val tT = ct.sum
    val tR = cr.sum
    val ones = Array.fill(256)(1L)
    // the real DSIR importance weight, +1-smoothed; NOT oracle-gated.
    // Summed in ascending bucket order — deterministic across runs.
    val logw = Array.tabulate(256)(i => math.log((ct(i) + 1.0) / (cr(i) + 1.0)))
    def dotL(c: Column, w: Array[Long]): Column =
      columnOf(DotWeightsLong(exprOf(c), w))
    cnts.select(col("__id").as("doc_id"),
        dotL(col("__c"), ones).as("n_grams"),
        dotL(col("__c"), ct).as("t_mass"),
        dotL(col("__c"), cr).as("r_mass"),
        columnOf(DotWeightsDouble(exprOf(col("__c")), logw)).as("dsir_logw"))
      // docs with no grams have no per_doc row in the oracle's
      // gram-instance spelling — drop them here too
      .filter(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"), col("t_mass"), col("r_mass"),
        col("dsir_logw"),
        (col("t_mass") * lit(tR) > col("r_mass") * lit(tT)).as("selected"))
  }

  def packOffsets(df: DataFrame, id: String, tokens: String,
      parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(id).cast("long"), col(tokens).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col(id))
      .sortWithinPartitions(col(id))
    val rdd = ds.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = bc.value(i)
      it.map { case (docId, tk) => val st = s; s += tk; (docId, tk, st) }
    }
    val res = spark.createDataFrame(out).toDF(id, tokens, "start")
    res
  }
}
