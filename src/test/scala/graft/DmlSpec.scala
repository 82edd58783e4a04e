package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Dml

/** Copy-on-write DML: row-level outcomes, and the scale contract —
  * only files containing matching rows are rewritten; everything
  * else keeps its original part file byte-for-byte (same path).
  */
class DmlSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def seed(): String = {
    val path = Files.createTempDirectory("dml").toString
    // 4 files hash-clustered on k: a predicate on one k value hits
    // exactly the file(s) holding that hash bucket
    (1L to 100L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "name", "amt")
      .repartition(4, col("k"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    path
  }

  private def files(path: String): Set[String] =
    new java.io.File(path).listFiles.map(_.getName)
      .filter(_.endsWith(".parquet")).toSet

  test("update rewrites only hit files; non-matching rows carried through") {
    val path = seed()
    val before = files(path)
    val stats = Dml.update(spark, path,
      cond = col("k") === 7L, set = Map("amt" -> (col("amt") + 1000.0)))
    assert(stats.rowsRewritten == 1 && stats.hitFiles == 1)
    val after = files(path)
    // 3 of 4 original part files must survive untouched
    assert((before intersect after).size == before.size - 1,
      s"expected exactly one original file replaced; before=$before after=$after")
    val got = spark.read.parquet(path).as[(Long, String, Double)].collect().toMap2
    assert(got(7L) == (("v7", 1070.0)))
    assert(got(8L) == (("v8", 80.0)))
    assert(got.size == 100)
  }

  test("delete drops only matching rows and prunes files") {
    val path = seed()
    val stats = Dml.delete(spark, path, col("k") <= 10L)
    assert(stats.rowsRewritten == 10)
    assert(stats.hitFiles >= 1 && stats.hitFiles <= 4)
    val ks = spark.read.parquet(path).select("k").as[Long].collect().toSet
    assert(ks == (11L to 100L).toSet)
  }

  test("delete with no matches is a no-op (no rewrite at all)") {
    val path = seed()
    val before = files(path)
    val stats = Dml.delete(spark, path, col("k") > 1000L)
    assert(stats == Dml.DmlStats(0, 0, 0))
    assert(files(path) == before)
  }

  test("merge updates matched, inserts unmatched, leaves the rest") {
    val path = seed()
    val source = Seq(
      (7L, "seven", -1.0),    // matched → amt updated
      (500L, "brand-new", 5.0) // not matched → inserted
    ).toDF("k", "name", "amt")
    val stats = Dml.merge(spark, path, source, on = Seq("k"),
      set = Map("amt" -> source("amt"), "name" -> source("name")))
    assert(stats.rowsRewritten == 1 && stats.rowsInserted == 1)
    val got = spark.read.parquet(path).as[(Long, String, Double)].collect().toMap2
    assert(got.size == 101)
    assert(got(7L) == (("seven", -1.0)))
    assert(got(500L) == (("brand-new", 5.0)))
    assert(got(8L) == (("v8", 80.0)))
  }

  test("merge rejects a source with duplicate keys") {
    val path = seed()
    val dup = Seq((7L, "a", 1.0), (7L, "b", 2.0)).toDF("k", "name", "amt")
    val e = intercept[IllegalArgumentException] {
      Dml.merge(spark, path, dup, Seq("k"), Map("amt" -> dup("amt")))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("non-selective update takes the full-rewrite path (root scan, no path list)") {
    val path = seed()
    // hits all 4 files (> HitFractionGuard): must degrade to the
    // root-path rewrite and still produce exactly the right rows
    val stats = Dml.update(spark, path,
      cond = col("k") <= 90L, set = Map("amt" -> (col("amt") + 1.0)))
    assert(stats.rowsRewritten == 90, stats.toString)
    assert(stats.hitFiles == 4, "full rewrite should swap every file")
    val got = spark.read.parquet(path).as[(Long, String, Double)].collect().toMap2
    assert(got.size == 100)
    assert(got(1L) == (("v1", 11.0)))
    assert(got(100L) == (("v100", 1000.0)))
  }

  test("non-selective delete full-rewrites and keeps only survivors") {
    val path = seed()
    val stats = Dml.delete(spark, path, col("k") <= 95L)
    assert(stats.rowsRewritten == 95 && stats.hitFiles == 4)
    val ks = spark.read.parquet(path).select("k").as[Long].collect().toSet
    assert(ks == (96L to 100L).toSet)
  }

  test("merge with a wide source takes the full-rewrite path with exact stats") {
    val path = seed()
    val source = (1L to 120L).map(k => (k, s"m$k", k * 2.0)).toDF("k", "name", "amt")
    val stats = Dml.merge(spark, path, source, on = Seq("k"),
      set = Map("amt" -> source("amt"), "name" -> source("name")))
    assert(stats.rowsRewritten == 100 && stats.rowsInserted == 20, stats.toString)
    val got = spark.read.parquet(path).as[(Long, String, Double)].collect().toMap2
    assert(got.size == 120)
    assert(got(7L) == (("m7", 14.0)) && got(120L) == (("m120", 240.0)))
  }

  test("insert with PK appends clean rows and reports the count") {
    val path = seed()
    val rows = Seq((101L, "new101", 1.0), (102L, "new102", 2.0)).toDF("k", "name", "amt")
    val stats = Dml.insert(spark, path, rows, pk = Seq("k"))
    assert(stats.rowsInserted == 2)
    assert(spark.read.parquet(path).count() == 102)
    assert(Dml.pkViolations(spark.read.parquet(path), Seq("k")).count() == 0)
  }

  test("insert rejects a batch that collides with an existing key; nothing is written") {
    val path = seed()
    val rows = Seq((7L, "clash", 0.0), (999L, "fine", 0.0)).toDF("k", "name", "amt")
    val e = intercept[IllegalArgumentException] {
      Dml.insert(spark, path, rows, pk = Seq("k"))
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
    assert(spark.read.parquet(path).count() == 100, "rejected insert must write nothing")
  }

  test("insert rejects a batch with internal duplicate keys") {
    val path = seed()
    val rows = Seq((300L, "a", 1.0), (300L, "b", 2.0)).toDF("k", "name", "amt")
    val e = intercept[IllegalArgumentException] {
      Dml.insert(spark, path, rows, pk = Seq("k"))
    }
    assert(e.getMessage.contains("within the batch"))
    assert(spark.read.parquet(path).count() == 100)
  }

  test("insert without PK skips enforcement (plain append)") {
    val path = seed()
    val rows = Seq((7L, "dup-ok", 0.0)).toDF("k", "name", "amt")
    val stats = Dml.insert(spark, path, rows)
    assert(stats.rowsInserted == 1)
    assert(Dml.pkViolations(spark.read.parquet(path), Seq("k"))
      .select("k").as[Long].collect().toSeq == Seq(7L))
  }

  test("update is convergent: re-running the same conditional set is stable shape") {
    val path = seed()
    Dml.update(spark, path, col("k") === 7L, Map("amt" -> lit(1.0)))
    Dml.update(spark, path, col("k") === 7L, Map("amt" -> lit(1.0)))
    val got = spark.read.parquet(path).filter(col("k") === 7L)
      .select("amt").as[Double].collect().toSeq
    assert(got == Seq(1.0))
  }

  test("compact collapses small files into the target count, data identical") {
    val path = seed() // 4 files
    // fragment further: two updates append rewritten part files
    Dml.update(spark, path, cond = col("k") === 7L,
      set = Map("amt" -> (col("amt") + 1.0)))
    Dml.update(spark, path, cond = col("k") === 8L,
      set = Map("amt" -> (col("amt") + 1.0)))
    val before = spark.read.parquet(path)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(files(path).size > 1)

    val stats = Dml.compact(spark, path, targetBytes = 1L << 30)
    assert(files(path).size == 1, s"expected 1 file, got ${files(path)}")
    assert(stats.rowsRewritten == 100)
    val after = spark.read.parquet(path)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(after == before, "compaction changed the data")

    // second compact is a no-op: target already met
    assert(Dml.compact(spark, path, targetBytes = 1L << 30)
      == Dml.DmlStats(0, 0, 0))
  }

  test("insertChecked rejects FK orphans and CHECK violations; accepts clean batches") {
    val path = seed()
    val parent = (1L to 50L).toDF("pk")
    // clean: fk satisfied (10 ∈ parent), check satisfied
    val ok = Seq((10L, "n", 5.0)).toDF("k", "name", "amt")
    Dml.insertChecked(spark, path, ok,
      fkParent = Some((parent, Seq("k" -> "pk"))), check = Some(col("amt") > 0.0))
    assertThrows[IllegalArgumentException] {
      Dml.insertChecked(spark, path, Seq((999L, "x", 5.0)).toDF("k", "name", "amt"),
        fkParent = Some((parent, Seq("k" -> "pk"))))
    }
    assertThrows[IllegalArgumentException] {
      Dml.insertChecked(spark, path, Seq((10L, "x", -5.0)).toDF("k", "name", "amt"),
        check = Some(col("amt") > 0.0))
    }
    // NULL check predicate passes (SQL UNKNOWN), NULL fk key exempt
    val nullRow = Seq((java.lang.Long.valueOf(10L), "x", null: java.lang.Double))
      .toDF("k", "name", "amt")
    Dml.insertChecked(spark, path, nullRow,
      fkParent = Some((parent, Seq("k" -> "pk"))), check = Some(col("amt") > 0.0))
  }

  test("assignSequence: contiguous ids in key order, invariant to partition count") {
    val df = (1L to 997L).map(k => k * 3 + 11).toDF("k")
    val a = Dml.assignSequence(df, "k", startWith = 100L, incrementBy = 7L, parts = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = Dml.assignSequence(df, "k", startWith = 100L, incrementBy = 7L, parts = 17)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "sequence must not depend on partitioning")
    val expected = (1L to 997L).map(k => k * 3 + 11).sorted.zipWithIndex
      .map { case (k, i) => (k, 100L + i * 7L) }
    assert(a.toSeq == expected)
  }

  private implicit class Tup3Ops(rows: Array[(Long, String, Double)]) {
    def toMap2: Map[Long, (String, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("hidden-dir check is relative to the table root, not the full path") {
    // a warehouse under a dot-dir or _work CI checkout must not hide
    // the whole table from the DML listing (reads would see rows while
    // UPDATE/DELETE silently report 0 files)
    val base = Files.createTempDirectory("dmlhidden")
    val path = base.resolve("_work").resolve(".ci").resolve("tbl").toString
    (1L to 10L).map(k => (k, k * 1.0)).toDF("k", "amt")
      .repartition(2).write.mode(SaveMode.Overwrite).parquet(path)
    val stats = Dml.update(spark, path,
      cond = col("k") === 3L, set = Map("amt" -> lit(99.0)))
    assert(stats.rowsRewritten == 1, s"update under hidden ancestors: $stats")
    val got = spark.read.parquet(path).where(col("k") === 3L)
      .select("amt").collect()(0).getDouble(0)
    assert(got == 99.0)
    // .graft_trash UNDER the root must still be invisible
    val del = Dml.delete(spark, path, cond = col("k") === 4L)
    assert(del.rowsRewritten == 1, s"delete under hidden ancestors: $del")
    assert(spark.read.parquet(path).count() === 9L)
  }
}
