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
