package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.Sessionize

/** The stateful (flatMapGroupsWithState) sessionizer must agree with
  * the window-function formulation (st02_sessionize) on session counts
  * per user — two independent implementations, one semantic.
  */
class SessionizeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("stateful sessionizer matches the window-function session counts") {
    val events = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Event]

    val stateful = Sessionize.sessionize(events)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("user_id"))
      .as[(Long, Long)].collect().toSeq

    val windowed = SparkEntry.queries("st02_sessionize")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq

    assert(stateful == windowed,
      s"stateful=$stateful\nwindowed=$windowed")
  }

  test("window-function batch sessionizer emits exactly the stateful path's sessions") {
    val events = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Event]
    def key(s: Dataset[Sessionize.Session]) =
      s.collect().map(x => (x.user_id, x.start.getTime, x.end.getTime, x.n_events))
        .sortBy(identity).toSeq
    assert(key(Sessionize.sessionizeBatch(events)) == key(Sessionize.sessionize(events)))
  }

  test("sub-millisecond timestamps sessionize at microsecond precision in both paths") {
    // two events 250µs apart must share a gap=0ms-adjacent session
    // boundary decision identically in both paths, and the emitted
    // bounds must keep their microseconds
    def ts(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L * 1000L).toInt)
      t
    }
    val base = 1700000000000000L // epoch µs
    val events = Seq(
      Sessionize.Event(1L, ts(base)),
      Sessionize.Event(1L, ts(base + 250)),        // 250µs later
      Sessionize.Event(1L, ts(base + 3600000000L)) // 1h later → new session
    ).toDS()
    def key(s: Dataset[Sessionize.Session]) =
      s.collect().map(x => (x.user_id,
        x.start.getTime * 1000 + x.start.getNanos / 1000 % 1000,
        x.end.getTime * 1000 + x.end.getNanos / 1000 % 1000,
        x.n_events)).sortBy(identity).toSeq
    val batch = key(Sessionize.sessionizeBatch(events))
    assert(batch == key(Sessionize.sessionize(events)))
    assert(batch.head._3 == base + 250, // µs survived into the session end
      s"expected µs-precise end, got ${batch.head}")
    assert(batch.map(_._4) == Seq(2, 1))
  }

  test("session event counts sum to total events per user") {
    val events = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Event]
    val bySessions = Sessionize.sessionize(events)
      .groupBy(col("user_id")).agg(sum(col("n_events")).as("n"))
    val byEvents = Catalog.table(spark, sfDir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(bySessions.orderBy("user_id").collect()
      .sameElements(byEvents.orderBy("user_id").collect()))
  }
}
