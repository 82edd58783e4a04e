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

  def clear(table: String): Unit = pk.remove(table.toLowerCase)

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
