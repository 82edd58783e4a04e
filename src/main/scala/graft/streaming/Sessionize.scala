package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization via flatMapGroupsWithState — the
  * custom-state path of Structured Streaming (SURVEY §2.6 ST2).
  *
  * State per user: the open session (start, last-seen, count). An event
  * further than `gap` from last-seen closes the session and emits it;
  * processing-time timeout flushes sessions when a user goes quiet.
  * The same function runs in batch mode (one group pass, no timeouts),
  * which is what SessionizeSpec uses to cross-check the window-function
  * formulation in StreamingQ.st02.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Int)

  val DefaultGapMs: Long = 30 * 60 * 1000L

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
              Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(_.ts.getTime).toArray.sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a cross-batch late event may predate the open
                  // session's start — extend the start bound too
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
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
                cur.map(s => Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)).toSeq
              else Seq.empty
            (closed.result() ++ tail).iterator
          }
      }
  }
}
