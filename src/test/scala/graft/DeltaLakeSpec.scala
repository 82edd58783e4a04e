package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, DeltaLake}

/** Transaction-log contracts for the minimal Delta analog: snapshot
  * isolation from uncommitted/stale files, overwrite-as-metadata,
  * time travel, and single-writer commit protection.
  */
class DeltaLakeSpec extends AnyFunSuite {
  import TestSession._

  private def freshTable(name: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_delta_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    dir
  }

  private def docs = Catalog.table(spark, sfDir, "documents")

  test("append commits accumulate; overwrite replaces the snapshot") {
    val t = freshTable("basic")
    val a = docs.where(col("doc_id") < 100).select("doc_id", "source")
    val b = docs.where(col("doc_id") >= 100 && col("doc_id") < 150).select("doc_id", "source")
    assert(DeltaLake.append(spark, a, t) == 0L)
    assert(DeltaLake.append(spark, b, t) == 1L)
    assert(DeltaLake.read(spark, t).count() == a.count() + b.count())
    val c = docs.where(col("doc_id") >= 400).select("doc_id", "source")
    assert(DeltaLake.overwrite(spark, c, t) == 2L)
    assert(DeltaLake.read(spark, t).count() == c.count())
    // overwrite is metadata-only: the version-0/1 parquet files remain
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val live = DeltaLake.read(spark, t).inputFiles.length
    assert(nFiles > live, s"expected stale files kept on disk ($nFiles vs $live live)")
  }

  test("time travel replays the log prefix") {
    val t = freshTable("tt")
    val a = docs.where(col("doc_id") < 50).select("doc_id")
    val b = docs.where(col("doc_id") >= 50 && col("doc_id") < 80).select("doc_id")
    DeltaLake.append(spark, a, t)
    DeltaLake.append(spark, b, t)
    DeltaLake.overwrite(spark, docs.limit(3).select("doc_id"), t)
    assert(DeltaLake.read(spark, t, versionAsOf = Some(0L)).count() == a.count())
    assert(DeltaLake.read(spark, t, versionAsOf = Some(1L)).count() == a.count() + b.count())
    assert(DeltaLake.read(spark, t).count() == 3)
    assert(DeltaLake.latestVersion(spark, t) == 2L)
  }

  test("snapshot ignores files the log does not name") {
    val t = freshTable("stray")
    DeltaLake.append(spark, docs.limit(10).select("doc_id"), t)
    val before = DeltaLake.read(spark, t).count()
    // a crashed writer's orphan: parquet on disk, never committed
    docs.limit(7).select("doc_id").write.mode("append").parquet(t)
    assert(DeltaLake.read(spark, t).count() == before,
      "uncommitted parquet files must stay invisible")
    // while a bare directory read sees the torn state
    assert(spark.read.parquet(t).count() == before + 7)
  }

  test("schema rides the log and survives empty snapshots") {
    val t = freshTable("schema")
    val df = docs.limit(5).select(col("doc_id"), col("n_chars").as("len"))
    DeltaLake.append(spark, df, t)
    DeltaLake.overwrite(spark, df.where(lit(false)), t)
    val empty = DeltaLake.read(spark, t)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("doc_id", "len"))
  }

  test("versioned delete rewrites only hit files and keeps history") {
    val t = freshTable("del")
    val a = docs.where(col("doc_id") < 100).select("doc_id", "source")
    val b = docs.where(col("doc_id") >= 100 && col("doc_id") < 200).select("doc_id", "source")
    DeltaLake.append(spark, a, t)
    DeltaLake.append(spark, b, t)
    val total = a.count() + b.count()
    val hits = DeltaLake.read(spark, t).where(col("doc_id") % 10 === 3).count()
    assert(hits > 0)
    val v = DeltaLake.delete(spark, t, col("doc_id") % 10 === 3)
    assert(v == 2L)
    assert(DeltaLake.read(spark, t).count() == total - hits)
    assert(DeltaLake.read(spark, t).where(col("doc_id") % 10 === 3).count() == 0)
    // pre-delete snapshot still intact
    assert(DeltaLake.read(spark, t, versionAsOf = Some(1L)).count() == total)
    // deleting nothing commits nothing
    assert(DeltaLake.delete(spark, t, col("doc_id") < 0) == 2L)
  }

  test("checkpoint collapses replay; tail commits still apply") {
    val t = freshTable("ck")
    DeltaLake.append(spark, docs.where(col("doc_id") < 60).select("doc_id"), t)
    DeltaLake.append(spark, docs.where(col("doc_id") >= 60 && col("doc_id") < 90).select("doc_id"), t)
    DeltaLake.checkpoint(spark, t)
    // a post-checkpoint commit that must layer on top of the checkpoint
    DeltaLake.append(spark, docs.where(col("doc_id") >= 400).select("doc_id"), t)
    val full = DeltaLake.read(spark, t).count()
    assert(DeltaLake.readFromCheckpoint(spark, t).count() == full)
    assert(full == docs.where(col("doc_id") < 90 || col("doc_id") >= 400).count())
  }

  test("compact rewrites the snapshot into fewer files, values unchanged") {
    val t = freshTable("opt")
    for (lo <- Seq(0, 100, 200, 300)) {
      DeltaLake.append(spark,
        docs.where(col("doc_id") >= lo && col("doc_id") < lo + 100)
          .select("doc_id", "n_chars").repartition(4), t)
    }
    val before = DeltaLake.read(spark, t)
    val sumBefore = before.agg(sum("n_chars")).head().getLong(0)
    val filesBefore = before.inputFiles.length
    assert(filesBefore >= 8)
    val v = DeltaLake.compact(spark, t, targetFiles = 2)
    val after = DeltaLake.read(spark, t)
    assert(after.inputFiles.length <= 2)
    assert(after.agg(sum("n_chars")).head().getLong(0) == sumBefore)
    assert(after.count() == before.count())
    // pre-compaction version still reads the old layout
    assert(DeltaLake.read(spark, t, versionAsOf = Some(v - 1)).count() == before.count())
  }

  test("streaming sink: exactly-once batches survive a checkpoint restart") {
    val t = freshTable("stream")
    val src = java.nio.file.Files.createTempDirectory("graft_dstream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dstream_ck").toString
    val events = Catalog.table(spark, sfDir, "events")
    events.write.mode("overwrite").parquet(src)
    def stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .select("event_id", "user_id", "event_type")
    graft.sources.DeltaLake.streamTo(stream, t, ckpt, appId = "dstream").stop()
    val want = events.count()
    assert(DeltaLake.read(spark, t).count() == want)
    // restart over the drained checkpoint: no duplicate commits
    graft.sources.DeltaLake.streamTo(stream, t, ckpt, appId = "dstream").stop()
    assert(DeltaLake.read(spark, t).count() == want, "restart duplicated rows")
    // explicit re-delivery of an old batch id is a silent no-op
    val before = DeltaLake.latestVersion(spark, t)
    assert(DeltaLake.appendIdempotent(spark, events.limit(5).select("event_id", "user_id", "event_type"),
      t, "dstream", txnVersion = 0L) == -1L)
    assert(DeltaLake.latestVersion(spark, t) == before)
  }

  test("vacuum reclaims unreferenced files; the retained snapshot is untouched") {
    val t = freshTable("vac")
    DeltaLake.append(spark, docs.where(col("doc_id") < 200).select("doc_id"), t)
    DeltaLake.overwrite(spark, docs.where(col("doc_id") >= 300).select("doc_id"), t)
    val want = DeltaLake.read(spark, t).count()
    val removed = DeltaLake.vacuum(spark, t, retainLast = 1)
    assert(removed > 0, "overwrite leftovers should be reclaimed")
    assert(DeltaLake.read(spark, t).count() == want)
    // version 0's files are gone — time travel there now fails
    intercept[Exception] {
      DeltaLake.read(spark, t, versionAsOf = Some(0L)).count()
    }
  }

  test("stats-based data skipping prunes files but never rows") {
    val t = freshTable("skip")
    // 5 commits, each a disjoint doc_id range → disjoint file stats
    for (lo <- 0 to 400 by 100) {
      DeltaLake.append(spark,
        docs.where(col("doc_id") >= lo && col("doc_id") < lo + 100)
          .select("doc_id", "n_chars").coalesce(1),
        t, statsCols = Seq("doc_id"))
    }
    val all = DeltaLake.read(spark, t)
    val totalFiles = all.inputFiles.length
    val pruned = DeltaLake.readRange(spark, t, "doc_id", 150, 249)
    assert(pruned.inputFiles.length < totalFiles,
      s"expected pruning below $totalFiles files")
    assert(pruned.inputFiles.length <= 2)
    val expect = all.where(col("doc_id") >= 150 && col("doc_id") <= 249)
      .agg(sum("n_chars"), count(lit(1))).head()
    val got = pruned.agg(sum("n_chars"), count(lit(1))).head()
    assert(got == expect, "pruned read changed the answer")
    // files without stats are conservatively kept
    DeltaLake.append(spark, docs.where(col("doc_id") < 20).select("doc_id", "n_chars"), t)
    val withUnstatted = DeltaLake.readRange(spark, t, "doc_id", 150, 249)
    assert(withUnstatted.count() == expect.getLong(1),
      "residual predicate must still filter unstatted files' rows")
  }

  test("foreign commits are never clobbered — new commits sequence past them") {
    val t = freshTable("guard")
    DeltaLake.append(spark, docs.limit(5).select("doc_id"), t)
    // another writer landed version 1 (empty commit) out-of-band
    val p = new org.apache.hadoop.fs.Path(s"$t/_delta_log/${"0" * 19}1.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, false)
    out.write("{}".getBytes("UTF-8")); out.close()
    // next append must observe it and take version 2, leaving v1 intact
    assert(DeltaLake.append(spark, docs.limit(3).select("doc_id"), t) == 2L)
    assert(fs.getFileStatus(p).getLen == 2L, "foreign commit file rewritten")
    assert(DeltaLake.read(spark, t).count() == 8)
  }
}
