package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.streaming.Sessionize

/** Sessionization has THREE independent implementations — the
  * SessionCountAgg custom aggregate (st02's plan), the window-lag
  * formulation, and the stateful flatMapGroupsWithState path — and one
  * semantic. All three must agree on the per-user session counts.
  */
class SessionizeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("aggregate, window-lag, and stateful sessionizers all agree") {
    val events = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Event]

    val stateful = Sessionize.sessionize(events)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("user_id"))
      .as[(Long, Long)].collect().toSeq

    // st02's plan: the SessionCountAgg typed imperative aggregate
    // st02 dropped its display sort (r11) — order here for comparison
    val aggregated = SparkEntry.queries("st02_sessionize")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

    // the window-lag formulation st02 used to run (kept here as the
    // independent cross-check)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ms"))
    val windowed = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ms"))
      .withColumn("prev", lag(col("ms"), 1).over(w))
      .filter(col("prev").isNull || col("ms") - col("prev") > 30L * 60 * 1000000)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("bigint").as("n_sessions"))
      .orderBy(col("user_id"))
      .as[(Long, Long)].collect().toSeq

    assert(stateful == aggregated,
      s"stateful=$stateful\naggregated=$aggregated")
    assert(windowed == aggregated,
      s"windowed=$windowed\naggregated=$aggregated")
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
