package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Catalog

/** Per-stage timing for the text-pipeline headliners (p12 bigram-LM,
  * d08 segment dedup, t02 quality-score calibration): cumulative
  * stagings isolate scan/tokenize cost from shuffle and reassembly so
  * a corpus-weight shift (the driver regenerates `documents` between
  * rounds) is attributable in one run — the BucketProf treatment for
  * the pipeline entries. t02 is a pure map scan over the same text
  * column, so its time is the "one tokenize-ish pass" calibration
  * yardstick the other stages divide by.
  * Run: tools/run_main.sh graft.tools.PipeProf <sfDir> [reps]
  */
object PipeProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.plans.{RebuildSegments, SegmentCount, SegmentMd5s, SlidingNgramHash64s}
    import graft.plans.HashExpressions.{columnOf, exprOf}

    def docs: DataFrame = Catalog.table(s, dir, "documents")

    def t(name: String)(body: => Unit): Unit = {
      body // warm-up
      System.gc(); Thread.sleep(200); System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-36s min=${times.min}%6.2f s  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- calibration: raw text scan + one fused map kernel
    t("t02_quality_score (map scan)") {
      noop(graft.queries.Pipeline.defs.find(_.name == "t02_quality_score").get
        .run(s, dir))
    }

    // ---- d08 cumulative stages
    val segWords = 8
    def segs = docs.select(col("doc_id"),
        posexplode(columnOf(SegmentMd5s(exprOf(col("text")), segWords)))
          .as(Seq("pos0", "__h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("__h"))
    t("d08 a: scan+md5s+explode") { segs.write.format("noop").mode("overwrite").save() }
    def winners = segs.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("__w"))
    t("d08 b: + winners groupBy(__h)") { noop(winners) }
    def keptPos = winners
      .select(col("__w").getField("doc_id").as("doc_id"),
        col("__w").getField("pos").as("pos"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("__kp"),
        count(lit(1)).as("n_kept"))
    t("d08 c: + keptPos groupBy(id)") { noop(keptPos) }
    t("d08 d: full (join+rebuild)") {
      noop(graft.llm.Dedup.segmentDedup(docs, "doc_id", "text", segWords))
    }

    // ---- p12 cumulative stages
    def train = docs.filter(col("source") === "src0")
      .select(columnOf(SlidingNgramHash64s(exprOf(col("text")), 1)).as("__wm"),
        columnOf(SlidingNgramHash64s(exprOf(col("text")), 2)).as("__bm"))
    t("p12 a: train gram arrays (scan)") { noop(train) }
    t("p12 b: c12 model aggregate") {
      train.select(posexplode(col("__bm")).as(Seq("__i", "__bh")), col("__wm"))
        .select(col("__bh"), element_at(col("__wm"), col("__i") + 1).as("__w1h"))
        .groupBy(col("__bh"), col("__w1h")).agg(count(lit(1)).as("__c"))
        .limit(graft.llm.NgramLm.MaxModelEntries + 1)
        .collect()
    }
    t("p12 c: vocab distinct count") {
      train.select(explode(col("__wm")).as("t")).distinct().count()
    }
    t("p12 d: score scan (model+probe)") {
      noop(graft.llm.NgramLm.score(docs, "doc_id", "text",
        col("source") === "src0"))
    }
    t("p12 e: full (+terciles)") {
      noop(graft.queries.Pipeline.defs.find(_.name == "p12_ngram_lm").get
        .run(s, dir))
    }
    // terciles sub-stages over a REUSED scored frame (parquet-backed
    // so the scoring scan is paid once, not inside each timing)
    val scoredPath = "/tmp/pipeprof_scored.parquet"
    graft.llm.NgramLm.score(docs, "doc_id", "text", col("source") === "src0")
      .write.mode("overwrite").parquet(scoredPath)
    def scored = s.read.parquet(scoredPath)
    t("p12 e1: terciles alone") {
      noop(graft.llm.NgramLm.terciles(scored, "doc_id"))
    }
    t("p12 e2: terciles + orderBy(id)") {
      noop(graft.llm.NgramLm.terciles(scored, "doc_id").orderBy(col("doc_id")))
    }
    s.stop()
  }
}
