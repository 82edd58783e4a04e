package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Catalog
import graft.streaming.StreamingOps

/** Streaming-shaped operators ST1–ST3 (SURVEY §2.6), run here in batch
  * mode against the same plans StreamingOps executes incrementally
  * (StreamingSpec proves batch/stream equivalence on st01).
  */
object StreamingQ {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QDef] = Seq(

    // ST1: tumbling-window aggregation (same plan as the readStream
    // version; window start == date_trunc hour for 1h tumbling).
    QDef.sql("st01_window_agg",
      """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      StreamingOps.windowedAgg(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // ST2: gap-based sessionization (30 min inactivity ends a session).
    QDef.sql("st02_sessionize",
      """SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |   CASE WHEN LAG(ts) OVER w IS NULL
        |         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      // epoch-micros lag/compare: the window sort key and the gap
      // test are plain longs (exact µs, matching the oracle's
      // interval compare), not timestamp/interval arithmetic.
      // The oracle's event_id tiebreak is omitted from the Spark sort:
      // equal-ts rows produce the same gap flags in either order (the
      // SUM is tie-order-invariant), and dropping the column narrows
      // every shuffled/sorted row.
      // Counting session STARTS (filter → count) instead of summing a
      // 0/1 flag over every event: the hash agg sees only ~1% of rows.
      // Same result — a session contributes exactly one start row. At
      // sf10 the measured gain is inside noise (the user_id exchange +
      // sort dominate at 1.0 s of the 1.7 s total; see README profile)
      // but the agg input reduction is the right shape at 100 TB.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ms"))
        .withColumn("prev", lag(col("ms"), 1).over(w))
        .filter(col("prev").isNull || col("ms") - col("prev") > 30L * 60 * 1000000)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("bigint").as("n_sessions"))
        .orderBy(col("user_id"))
    },

    // ST3: stream-batch (fact-dim) join shape: events enriched with a
    // broadcast dim — in streaming mode the identical plan is a
    // stream-static join.
    QDef.sql("st03_stream_join",
      """SELECT c_mktsegment, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .join(broadcast(t(s, dir, "customer")), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    },

    // ST5: streaming dedup — at-least-once input (events delivered
    // twice here) repaired to exactly-once by key. The batch plan is
    // dropDuplicates over the duplicated union; the streaming plan
    // (dropDuplicatesWithinWatermark, bounded state) is proven
    // equivalent in StreamDedupSpec.
    QDef.sql("st04_stream_dedup",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM (SELECT DISTINCT event_id, user_id FROM
        |  (SELECT event_id, user_id FROM events
        |   UNION ALL SELECT event_id, user_id FROM events))""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      StreamingOps.dedupWithinWatermark(
          e.unionAll(e), Seq("event_id"), "ts", "10 minutes")
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          count_distinct(col("user_id")).cast("bigint").as("n_users"))
    }
  )
}
