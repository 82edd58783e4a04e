package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** CREATE/DROP SEQUENCE + nextval()/currval() (reference
  * src/catalog/catalog_entry/sequence_catalog_entry.cpp +
  * src/function/scalar/sequence/nextval.cpp, pinned by
  * test/sql/catalog/sequence): session-scoped counters with START
  * WITH / INCREMENT BY / MIN/MAXVALUE / CYCLE.
  *
  * Scale note: like the reference's, this nextval is a single-node
  * transactional counter — correct in local mode (one JVM), NOT a
  * distributed id generator. The engine's scale path for id
  * assignment is the u06 keyed-id operator (sources/Dml.sequence),
  * which derives contiguous ids from a deterministic sort — that is
  * what a 1000-executor job should use. Documented divergence, same
  * single-writer shape as the reference.
  */
object Sequences {

  final class SeqState(val start: Long, val inc: Long, val minV: Long,
      val maxV: Long, val cycle: Boolean) {
    val used = new java.util.concurrent.atomic.AtomicBoolean(false)
    val current = new AtomicLong(start)
    def next(name: String): Long = synchronized {
      if (!used.getAndSet(true)) return current.get()
      val n = current.get() + inc
      val wrapped =
        if (inc > 0 && n > maxV) {
          if (!cycle) throw new IllegalStateException(
            s"nextval: sequence $name reached its maximum value $maxV")
          minV
        } else if (inc < 0 && n < minV) {
          if (!cycle) throw new IllegalStateException(
            s"nextval: sequence $name reached its minimum value $minV")
          maxV
        } else n
      current.set(wrapped)
      wrapped
    }
    def curr(name: String): Long = {
      if (!used.get()) throw new IllegalStateException(
        s"currval: sequence $name has not been used yet")
      current.get()
    }
  }

  private val seqs = new ConcurrentHashMap[String, SeqState]()

  val CreateRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?SEQUENCE\s+""" +
      """(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*(.*?);?\s*$""").r
  val DropRe =
    """(?is)^\s*DROP\s+SEQUENCE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$""".r

  private def optNum(opts: String, re: String): Option[Long] =
    re.r.findFirstMatchIn(opts).map(_.group(1).toLong)

  def create(orReplace: Boolean, ifNotExists: Boolean, name0: String,
      opts: String): Unit = {
    val name = name0.toLowerCase
    if (!orReplace && ifNotExists && seqs.containsKey(name)) return
    require(orReplace || ifNotExists || !seqs.containsKey(name),
      s"CREATE SEQUENCE: $name0 already exists")
    val inc = optNum(opts, """(?is)INCREMENT(?:\s+BY)?\s+(-?\d+)""").getOrElse(1L)
    val minV = optNum(opts, """(?is)MINVALUE\s+(-?\d+)""")
      .getOrElse(if (inc > 0) 1L else Long.MinValue + 1)
    val maxV = optNum(opts, """(?is)MAXVALUE\s+(-?\d+)""")
      .getOrElse(if (inc > 0) Long.MaxValue - 1 else -1L)
    val start = optNum(opts, """(?is)START(?:\s+WITH)?\s+(-?\d+)""")
      .getOrElse(if (inc > 0) minV else maxV)
    val cycle = """(?is)(?<!NO\s)CYCLE""".r.findFirstIn(opts).isDefined &&
      """(?is)NO\s+CYCLE""".r.findFirstIn(opts).isEmpty
    require(inc != 0, "CREATE SEQUENCE: INCREMENT BY 0")
    seqs.put(name, new SeqState(start, inc, minV, maxV, cycle))
  }

  def drop(name: String, ifExists: Boolean): Unit = {
    val had = seqs.remove(name.toLowerCase) != null
    require(had || ifExists, s"DROP SEQUENCE: no sequence named $name")
  }

  def next(name: String): Long = {
    val s = seqs.get(name.toLowerCase)
    require(s != null, s"nextval: no sequence named $name")
    s.next(name)
  }

  def curr(name: String): Long = {
    val s = seqs.get(name.toLowerCase)
    require(s != null, s"currval: no sequence named $name")
    s.curr(name)
  }

  def clearAll(): Unit = seqs.clear()
}
