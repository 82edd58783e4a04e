package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** UPDATE / DELETE / MERGE over parquet tables as copy-on-write file
  * rewrites — the reference's persistent DML surface
  * (/root/reference/src/execution/operator/persistent/physical_update.cpp,
  * physical_delete.cpp, physical_insert.cpp's ON CONFLICT path)
  * re-expressed for an immutable columnar store.
  *
  * Scale design: a DML touching 0.1% of a 100 TB table must NOT
  * rewrite 100 TB. Every operation here first finds the HIT FILES —
  * the parquet files that contain at least one matching row — via a
  * predicate-pushed scan projecting `_metadata.file_path` (row-group
  * stats make this cheap), then rewrites ONLY those files:
  * new part files are appended to the table directory and the hit
  * files are deleted. Untouched files are never read twice, never
  * rewritten. This is the same copy-on-write contract Delta/Iceberg
  * implement; here the "commit" is the file swap itself.
  *
  * Posture (documented, SURVEY §5): no MVCC — a reader concurrent
  * with the swap can see both old and new files. The reference gets
  * isolation from its transaction manager
  * (/root/reference/src/transaction/duck_transaction_manager.cpp);
  * a production Spark deployment would get it from a table format's
  * log. Batch-pipeline semantics (one writer, readers between jobs)
  * are exact.
  */
object Dml {

  /** Rows rewritten / files rewritten / rows appended, for observability
    * ("how much of the table did this DML touch").
    */
  case class DmlStats(hitFiles: Long, rowsRewritten: Long, rowsInserted: Long)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Files containing ≥1 row matching `cond` — predicate-pushed scan,
    * file list only (bounded by file count, not row count).
    */
  private def hitFiles(spark: SparkSession, path: String, cond: Column): Seq[String] =
    spark.read.parquet(path)
      .filter(cond)
      .select(col("_metadata.file_path"))
      .distinct()
      .collect().map(_.getString(0)).toSeq

  /** Append `df` as new part files, then delete `oldFiles`. Write
    * happens BEFORE delete so a crash can only leave extra (stale)
    * files, never lose rows; re-running the same DML converges.
    */
  private def swap(spark: SparkSession, path: String,
                   df: DataFrame, oldFiles: Seq[String]): Unit = {
    df.write.mode(SaveMode.Append).parquet(path)
    val hfs = fs(spark, path)
    oldFiles.foreach(f => hfs.delete(new Path(f), false))
  }

  /** UPDATE <path> SET <set> WHERE <cond>. Only hit files are
    * rewritten; non-matching rows in a hit file are carried through
    * unchanged.
    */
  def update(spark: SparkSession, path: String,
             cond: Column, set: Map[String, Column]): DmlStats = {
    val hits = hitFiles(spark, path, cond)
    if (hits.isEmpty) return DmlStats(0, 0, 0)
    val hit = spark.read.parquet(hits: _*)
    val cols = hit.columns.map { c =>
      set.get(c) match {
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }
    val rewritten = hit.select(cols.toIndexedSeq: _*)
    val nRewritten = hit.filter(cond).count()
    swap(spark, path, rewritten, hits)
    DmlStats(hits.size, nRewritten, 0)
  }

  /** DELETE FROM <path> WHERE <cond>: hit files are rewritten with
    * the matching rows dropped.
    */
  def delete(spark: SparkSession, path: String, cond: Column): DmlStats = {
    val hits = hitFiles(spark, path, cond)
    if (hits.isEmpty) return DmlStats(0, 0, 0)
    val hit = spark.read.parquet(hits: _*)
    val kept = hit.filter(!coalesce(cond, lit(false)))
    val nDeleted = hit.count() - kept.count()
    swap(spark, path, kept, hits)
    DmlStats(hits.size, nDeleted, 0)
  }

  /** MERGE INTO <path> t USING <source> s ON t.<on> = s.<on>
    *   WHEN MATCHED THEN UPDATE SET <set>   (source columns via `s`)
    *   WHEN NOT MATCHED THEN INSERT (all target columns from source).
    *
    * `set` maps target column → expression over the joined row
    * (reference source columns with their source names). Inserted
    * rows take the source's values for the target's columns.
    *
    * Hit files are files holding ≥1 matched key, found with a
    * broadcast-friendly semi join. A source key absent from every hit
    * file is absent from the whole table (any file containing it
    * would be a hit), so the not-matched side anti-joins the hit
    * files only — the full table is scanned exactly once, for the
    * file-level probe.
    *
    * `source` must be unique per key (classic MERGE cardinality rule;
    * enforced here — the reference errors the same way).
    */
  def merge(spark: SparkSession, path: String, source: DataFrame,
            on: Seq[String], set: Map[String, Column]): DmlStats = {
    val dupKeys = source.groupBy(on.map(col).toIndexedSeq: _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0, "MERGE source has duplicate join keys")

    val target = spark.read.parquet(path)
    // project the metadata column off the scan BEFORE the join — it is
    // a scan-level hidden column and does not survive resolution
    // through a join
    val probe = target.select(
      (on.map(col) :+ col("_metadata.file_path").as("__file")).toIndexedSeq: _*)
    val hits = probe
      .join(source.select(on.map(col).toIndexedSeq: _*).distinct(), on, "left_semi")
      .select(col("__file"))
      .distinct().collect().map(_.getString(0)).toSeq

    val targetCols = target.columns.toSeq
    val inserts =
      if (hits.isEmpty) source.select(targetCols.map(col).toIndexedSeq: _*)
      else source.join(spark.read.parquet(hits: _*), on, "left_anti")
        .select(targetCols.map(col).toIndexedSeq: _*)
    val nInserts = inserts.count()

    if (hits.isEmpty) {
      inserts.write.mode(SaveMode.Append).parquet(path)
      return DmlStats(0, 0, nInserts)
    }

    val hit = spark.read.parquet(hits: _*)
    // left join: unmatched rows in a hit file pass through unchanged;
    // matched rows get `set` applied (source cols resolve via `source`)
    val joined = hit.join(source, on.map(c => hit(c) === source(c)).reduce(_ && _), "left")
    val matched = on.map(c => source(c).isNotNull).reduce(_ && _)
    val outCols = targetCols.map { c =>
      set.get(c) match {
        case Some(v) => when(matched, v).otherwise(hit(c)).as(c)
        case None    => hit(c).as(c)
      }
    }
    val rewritten = joined.select(outCols.toIndexedSeq: _*)
    val nMatched = hit.join(source, on.map(c => hit(c) === source(c)).reduce(_ && _), "left_semi").count()
    swap(spark, path, rewritten.unionByName(inserts), hits)
    DmlStats(hits.size, nMatched, nInserts)
  }
}
