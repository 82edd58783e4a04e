package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** BEGIN / COMMIT / ROLLBACK over the copy-on-write DML layer — the
  * reference's transaction statements
  * (src/parser/statement/transaction_statement.cpp; semantics from
  * src/transaction/duck_transaction_manager.cpp) mapped onto
  * file-level undo:
  *
  *   - BEGIN snapshots nothing up front; the FIRST mutation of each
  *     table inside the transaction records its data-file list.
  *   - While a transaction is open, the swap/delete path MOVES
  *     replaced files into `<table>/.graft_trash/` instead of
  *     deleting them (hidden dirs are invisible to every reader:
  *     Spark's file index and [[Dml]]'s listings skip dot-paths).
  *   - COMMIT purges the trash — the deletes the swap deferred.
  *   - ROLLBACK deletes files added since the snapshot and moves the
  *     trashed originals back: the table's file set returns to
  *     exactly its BEGIN state.
  *
  * READER SNAPSHOT ISOLATION (the reference's MVCC contract,
  * duck_transaction_manager.cpp, pinned against two concurrent
  * python-duckdb connections): BEGIN pins every managed table's file
  * list and shadows the table name with a temp view reading exactly
  * those files. A concurrent writer — another logical connection,
  * expressed here as [[foreign]]-wrapped DML, since the front door
  * is one connection — swaps files as usual, but its deletes are
  * deferred to a hidden pin-trash and each RENAME re-points the open
  * transaction's pinned view, so the reader keeps seeing its BEGIN
  * snapshot (DuckDB: A mid-txn still sees the pre-image, 100 vs
  * B's committed 5100). The transaction's OWN writes unpin the table
  * (own-write visibility, like the reference). COMMIT/ROLLBACK drop
  * the pins: both then see the foreign writer's committed state —
  * ROLLBACK undoes only the transaction's own mutations, never a
  * concurrent committed write (DuckDB: rollback then read = 5105).
  *
  * Remaining honest divergences: single in-process writer at a time;
  * DDL (CREATE/DROP) autocommits; a second concurrent TRANSACTION
  * (not just writer) is not modeled — the front door is one
  * connection.
  */
object Txn {

  private case class TableUndo(path: String, snapshot: Set[String])

  /** A pinned table: name, storage path, and the exact files the
    * open transaction reads (re-pointed when a foreign writer
    * trash-renames one). */
  private case class Pin(name: String, path: String,
      var files: Seq[String], var active: Boolean)

  @volatile private var open = false
  private val undo = mutable.LinkedHashMap.empty[String, TableUndo]
  private val pins = mutable.LinkedHashMap.empty[String, Pin]
  private val foreignMode = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
  private var session: SparkSession = _

  def isActive: Boolean = open

  /** Runs `body` as a SECOND logical connection: its swaps defer
    * deletes for the open reader's pins but record NO undo — a
    * concurrent writer's commit survives this transaction's
    * ROLLBACK, exactly as in the reference. */
  def foreign[T](body: => T): T = {
    foreignMode.set(true)
    try body finally foreignMode.set(false)
  }

  def begin(): Unit = begin(null)

  def begin(spark: SparkSession): Unit = synchronized {
    require(!open, "BEGIN: a transaction is already active")
    open = true
    undo.clear()
    pins.clear()
    session = spark
    if (spark != null) pinCatalogTables(spark)
  }

  /** Snapshot every managed table in the current database behind a
    * shadowing temp view over its exact file list. Empty tables are
    * not pinned (nothing to protect; parquet cannot infer an empty
    * schema from zero files). */
  private def pinCatalogTables(spark: SparkSession): Unit = {
    val cat = spark.sessionState.catalog
    cat.listTables(cat.getCurrentDatabase).foreach { id =>
      if (!cat.isTempView(id)) {
        try {
          val meta = cat.getTableMetadata(id)
          if (meta.provider.exists(_.equalsIgnoreCase("parquet"))) {
            val path = meta.location.toString
            val files = dataFiles(spark, path)
            if (files.nonEmpty) {
              val pin = Pin(id.table, path, files, active = true)
              pins(key(path)) = pin
              spark.read.parquet(files: _*).createOrReplaceTempView(id.table)
            }
          }
        } catch { case _: Exception => } // views/odd providers: not pinned
      }
    }
  }

  /** Drop a table's pin (own-write visibility / DML target
    * resolution) — reads go back to the live listing. A FOREIGN
    * writer must NOT unpin: the pin is precisely what keeps the open
    * reader's snapshot view alive against that writer's swaps. */
  def unpin(spark: SparkSession, tableName: String): Unit = synchronized {
    if (foreignMode.get()) return
    pins.values.find(p => p.active && p.name == tableName).foreach { p =>
      p.active = false
      spark.catalog.dropTempView(p.name)
    }
  }

  private def unpinByPath(spark: SparkSession, path: String): Unit =
    pins.get(key(path)).filter(_.active).foreach { p =>
      p.active = false
      spark.catalog.dropTempView(p.name)
    }

  /** A foreign writer renamed `from` to `to` under the pin-trash —
    * re-point the open reader's view at the moved bytes. */
  private def repoint(spark: SparkSession, path: String,
      from: String, to: String): Unit =
    pins.get(key(path)).filter(_.active).foreach { p =>
      p.files = p.files.map(f => if (norm(f) == norm(from)) to else f)
      spark.read.parquet(p.files: _*).createOrReplaceTempView(p.name)
    }

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val hfs = fs(spark, path)
    val root = hfs.makeQualified(new Path(path))
    if (!hfs.exists(root)) return Nil
    val it = hfs.listFiles(root, true)
    val buf = mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      // hidden-ness is judged relative to the table root, matching
      // Spark's listing filter — ancestors above the root (dot-dir
      // homes, _work CI checkouts) must not hide the whole table
      if (st.isFile && !Dml.hiddenBelow(root, st.getPath))
        buf += st.getPath.toString
    }
    buf.toSeq
  }

  private val foreignTouched = mutable.LinkedHashSet.empty[String]

  /** Record the table's pre-mutation file list, once per table per
    * transaction. No-op outside a transaction. A foreign writer
    * records no undo (its commit must survive ROLLBACK); the
    * transaction's own writes also unpin the table so it reads its
    * own mutations.
    */
  def touch(spark: SparkSession, path: String): Unit = synchronized {
    if (open && foreignMode.get()) {
      // mixed own+foreign writes to ONE table cannot both keep their
      // guarantees (the foreign commit must survive ROLLBACK, but the
      // own undo tracks the same files) — the reference raises a
      // write-write conflict here (duck_transaction_manager.cpp /
      // "Conflict on tuple" in test/sql/transactions)
      if (undo.contains(key(path)))
        throw new IllegalStateException(
          s"write-write conflict: table at ${key(path)} was already " +
          "modified by the open transaction")
      foreignTouched += key(path)
    } else if (open) {
      if (foreignTouched.contains(key(path)))
        throw new IllegalStateException(
          s"write-write conflict: table at ${key(path)} was already " +
          "modified by a concurrent transaction")
      unpinByPath(spark, path)
      if (!undo.contains(key(path)))
        undo(key(path)) = TableUndo(path, dataFiles(spark, path).toSet)
    }
  }

  private def key(path: String) = path.stripSuffix("/")

  /** Filesystem-path normal form — Spark's `_metadata.file_path`
    * ("file:///x") and Hadoop listings ("file:/x") must compare equal. */
  private def norm(f: String): String = new Path(f).toUri.getPath

  private def trashDir(path: String) = new Path(path, ".graft_trash")

  /** Defer a file's deletion to COMMIT: move it into the table's
    * hidden trash dir. A file that is NOT in the BEGIN snapshot was
    * created inside this transaction — replacing it needs no undo, so
    * it deletes outright (trashing it would make ROLLBACK restore an
    * intermediate state: the file exists in neither the BEGIN nor the
    * would-be-committed file set). Caller guarantees [[touch]] ran
    * first.
    */
  def trash(spark: SparkSession, path: String, file: String): Unit = {
    val hfs = fs(spark, path)
    if (foreignMode.get()) {
      // concurrent-writer path: the delete is deferred ONLY to keep
      // the open reader's pinned snapshot readable — rename under the
      // pin-trash and re-point the pinned view at the moved bytes
      val pinnedHere = synchronized {
        pins.get(key(path)).exists(p =>
          p.active && p.files.exists(norm(_) == norm(file)))
      }
      if (!pinnedHere) {
        hfs.delete(new Path(file), false)
        return
      }
      val dir = new Path(trashDir(path), "pin")
      if (!hfs.exists(dir)) hfs.mkdirs(dir)
      val src = new Path(file)
      val dst = new Path(dir, src.getName)
      require(hfs.rename(src, dst), s"txn: failed to pin-trash $file")
      synchronized { repoint(spark, path, file, dst.toString) }
      return
    }
    val inSnapshot = synchronized {
      undo.get(key(path)).exists(_.snapshot.contains(file))
    }
    if (!inSnapshot) {
      hfs.delete(new Path(file), false)
      return
    }
    val dir = trashDir(path)
    if (!hfs.exists(dir)) hfs.mkdirs(dir)
    val src = new Path(file)
    require(hfs.rename(src, new Path(dir, src.getName)),
      s"txn: failed to trash $file")
  }

  private def dropPins(spark: SparkSession): Unit = {
    pins.values.filter(_.active).foreach(p => spark.catalog.dropTempView(p.name))
    // invalidate cached file indexes for every pinned table — a
    // foreign writer's pin-trash renames are purged by now, so any
    // relation resolved mid-transaction holds dead file paths
    pins.values.foreach { p =>
      try spark.catalog.refreshTable(p.name) catch { case _: Exception => }
    }
    pins.clear()
  }

  private def purgeTrash(spark: SparkSession, paths: Iterable[String]): Unit =
    paths.foreach { p =>
      val hfs = fs(spark, p)
      val dir = trashDir(p)
      if (hfs.exists(dir)) hfs.delete(dir, true)
      // the session catalog caches resolved file indexes — a reader
      // that resolved the table mid-transaction must re-list now that
      // the pin-trash (a foreign writer's deferred deletes) is gone
      spark.catalog.refreshByPath(p)
    }

  def commit(spark: SparkSession): Unit = synchronized {
    require(open, "COMMIT: no active transaction")
    purgeTrash(spark, undo.values.map(_.path) ++ foreignTouched)
    dropPins(spark)
    undo.clear()
    foreignTouched.clear()
    open = false
    session = null
  }

  def rollback(spark: SparkSession): Unit = synchronized {
    require(open, "ROLLBACK: no active transaction")
    undo.values.foreach { u =>
      val hfs = fs(spark, u.path)
      // drop files added after BEGIN
      dataFiles(spark, u.path).filterNot(u.snapshot)
        .foreach(f => hfs.delete(new Path(f), false))
      // restore the trashed originals (the non-recursive file listing
      // skips the pin/ subdir — foreign writers' committed swaps are
      // NOT restored, matching the reference: rollback undoes only
      // this transaction's own writes)
      val dir = trashDir(u.path)
      if (hfs.exists(dir)) {
        val it = hfs.listFiles(dir, false)
        while (it.hasNext) {
          val st = it.next()
          require(hfs.rename(st.getPath, new Path(u.path, st.getPath.getName)),
            s"txn: failed to restore ${st.getPath}")
        }
        hfs.delete(dir, true)
      }
      spark.catalog.refreshByPath(u.path)
    }
    purgeTrash(spark, foreignTouched)
    dropPins(spark)
    undo.clear()
    foreignTouched.clear()
    open = false
    session = null
  }
}
