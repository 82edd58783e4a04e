package graft.plans

import java.util.concurrent.ConcurrentHashMap

/** Session-shared table metadata the Spark catalog cannot carry:
  * PRIMARY KEY columns captured from dialect DDL. The reference
  * stores these on the table's bound constraints
  * (/root/reference/src/parser/statement/create_statement.cpp →
  * constraints); Spark's DDL has no inline-constraint grammar, so
  * the dialect records them here while stripping the spelling, and
  * the DML front door (sources/DmlSql) reads them back to default
  * the ON CONFLICT target and INSERT OR REPLACE/IGNORE keys.
  *
  * Keyed by lower-cased table name (the dialect's tables are
  * single-part names in the session catalog). JVM-global like the
  * session itself; CREATE OR REPLACE overwrites, DROP clears.
  */
object TableMeta {
  private val pk = new ConcurrentHashMap[String, Seq[String]]()

  def recordPk(table: String, cols: Seq[String]): Unit =
    if (cols.nonEmpty) pk.put(table.toLowerCase, cols)

  def primaryKey(table: String): Option[Seq[String]] =
    Option(pk.get(table.toLowerCase))

  def clear(table: String): Unit = {
    pk.remove(table.toLowerCase)
    defaults.remove(table.toLowerCase)
    gencols.remove(table.toLowerCase)
    declOrder.remove(table.toLowerCase)
  }

  // ---- column DEFAULT expressions (dialect DDL) ----
  // reference: create_statement.cpp column DefaultValue constraint;
  // used by the DML front door to fill unnamed INSERT columns (the
  // reference binds the default expression the same way).
  private val defaults = new ConcurrentHashMap[String, Map[String, String]]()

  def recordDefaults(table: String, m: Map[String, String]): Unit =
    if (m.nonEmpty) defaults.put(table.toLowerCase, m) else defaults.remove(table.toLowerCase)

  def columnDefaults(table: String): Map[String, String] =
    Option(defaults.get(table.toLowerCase)).getOrElse(Map.empty)

  // ---- generated columns (dialect DDL `col AS (expr)`) ----
  // reference: test/sql/generated_columns/{virtual,stored}. One
  // documented divergence: VIRTUAL is materialized at write time here
  // (recomputed on every INSERT and UPDATE) — reads are identical,
  // and parquet has no compute-on-scan column without a view layer.
  final case class GenCol(name: String, expr: String, virtual: Boolean)

  private val gencols = new ConcurrentHashMap[String, Seq[GenCol]]()

  def recordGenerated(table: String, g: Seq[GenCol]): Unit =
    if (g.nonEmpty) gencols.put(table.toLowerCase, g) else gencols.remove(table.toLowerCase)

  def generated(table: String): Seq[GenCol] =
    Option(gencols.get(table.toLowerCase)).getOrElse(Nil)

  // full declared column order (physical + generated interleaved),
  // so reads keep the DDL's column order after gencols are appended
  private val declOrder = new ConcurrentHashMap[String, Seq[String]]()

  def recordDeclaredOrder(table: String, cols: Seq[String]): Unit =
    declOrder.put(table.toLowerCase, cols)

  def declaredOrder(table: String): Option[Seq[String]] =
    Option(declOrder.get(table.toLowerCase))

  // ---- secondary-index records (sources/Indexing) ----
  private val indexes = new ConcurrentHashMap[String, (String, Seq[String])]()

  def recordIndex(table: String, name: String, cols: Seq[String]): Unit =
    indexes.put(name.toLowerCase, (table.toLowerCase, cols))

  def dropIndex(name: String): Unit = indexes.remove(name.toLowerCase)

  def indexOn(table: String): Option[(String, Seq[String])] = {
    var out: Option[(String, Seq[String])] = None
    indexes.forEach { (n, v) => if (v._1 == table.toLowerCase) out = Some((n, v._2)) }
    out
  }
}
