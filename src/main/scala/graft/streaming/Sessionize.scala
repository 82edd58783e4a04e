package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization via flatMapGroupsWithState — the
  * custom-state path of Structured Streaming (SURVEY §2.6 ST2).
  *
  * State per user: the open session (start, last-seen, count). An event
  * further than `gap` from last-seen closes the session and emits it;
  * processing-time timeout flushes sessions when a user goes quiet.
  * The same function runs in batch mode (one group pass, no timeouts),
  * which SessionizeSpec uses to cross-check [[sessionizeBatch]] — but
  * batch callers should use [[sessionizeBatch]]: the stateful path
  * sorts a user's entire history in executor memory, fine per
  * micro-batch, an OOM straggler for a hot user in a 100 TB batch.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Int)

  val DefaultGapMs: Long = 30 * 60 * 1000L

  /** Both paths sessionize at MICROsecond precision — the source
    * timestamps' resolution (Catalog truncates the nanos parquet to
    * µs) and what the st02 window formulation and the DuckDB interval
    * oracle compare at. Milliseconds here would make a sub-ms pair of
    * events sessionize differently from st02 and lose µs in the
    * emitted bounds.
    */
  private def tsMicros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Batch-mode sessionization as a window-function gap-id plan:
    * lag → new-session flag → running sum = session id → one
    * aggregation. This is THE batch path: unlike the stateful
    * function below it never materializes a user's full history in
    * executor memory (`toArray.sorted`), so a hot user at 100 TB is
    * a big sort partition, not an OOM. Timestamps travel as epoch
    * micros so the sort key and the gap compare are plain longs at
    * full source precision.
    *
    * The aggregation keys (user_id, sess_id) start with the window's
    * partition key, so the groupBy reuses the window's hash
    * partitioning — one shuffle total.
    *
    * SessionizeSpec proves this emits exactly the stateful path's
    * sessions (start, end, n_events), not just matching counts.
    */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long = DefaultGapMs)
      : Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    events.toDF()
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("us")).as("smin"), max(col("us")).as("smax"),
        count(lit(1)).cast("int").as("n_events"))
      .select(col("user_id"),
        timestamp_micros(col("smin")).as("start"),
        timestamp_micros(col("smax")).as("end"),
        col("n_events"))
      .as[Session]
  }

  def sessionize(events: Dataset[Event], gapMs: Long = DefaultGapMs,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(user, microsTs(s.start), microsTs(s.last), s.n)).toSeq
            state.remove()
            out.iterator
          } else {
            // state longs are epoch MICROS — full source precision,
            // matching sessionizeBatch and the st02 oracle
            val sorted = rows.map(e => tsMicros(e.ts)).toArray.sorted
            val gapUs = gapMs * 1000L
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  // a cross-batch late event may predate the open
                  // session's start — extend the start bound too
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += Session(user, microsTs(s.start), microsTs(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapMs)
            // batch mode: the iterator is the whole group — flush the
            // still-open session too so output is complete
            val tail =
              if (timeout == GroupStateTimeout.NoTimeout)
                cur.map(s => Session(user, microsTs(s.start), microsTs(s.last), s.n)).toSeq
              else Seq.empty
            (closed.result() ++ tail).iterator
          }
      }
  }
}
