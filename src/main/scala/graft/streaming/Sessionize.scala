package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming sessionization over the `events` stream shape:
  * a session closes after `gapSeconds` of per-user silence
  * (event-time), emitted via `flatMapGroupsWithState` with
  * event-time timeout — the KeyValueGroupedDataset custom-state path
  * for semantics windowed aggregation can't express.
  *
  * Scale: state is per-user (one small SessionState), partitioned by
  * the group key across executors; the watermark bounds state size and
  * lateness. Same gaps-and-islands semantics as the batch
  * `q_sessionize` query (graft.analytics.Analytics).
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long, firstEventId: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, first_event_id: Long)

  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val gapMs = gapSeconds * 1000
          // gap test on whole epoch-seconds, matching the batch query's
          // unix_timestamp() semantics (sub-second parts truncated)
          def gapExceeded(prev: Long, t: Long): Boolean =
            t / 1000 - prev / 1000 > gapSeconds
          if (state.hasTimedOut) {
            // silence exceeded the gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n, s.firstEventId))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if !gapExceeded(s.last, t) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.firstEventId)
                  cur = Some(SessionState(t, t, 1, e.event_id))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.event_id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time out once the watermark passes last-event + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch-mode wire-up used by the spec: file stream of events JSON. */
  def fromJsonDir(spark: SparkSession, inDir: String): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
      .json(inDir)
      .as[Event]
  }
}
