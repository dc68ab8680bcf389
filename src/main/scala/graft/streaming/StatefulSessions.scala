package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization on `flatMapGroupsWithState` — the
  * arbitrary-state streaming API (SURVEY §2.9's session-window extension
  * in its fully-custom form; the reference's DStream design has no
  * session concept at all).
  *
  * Three session operators now coexist, deliberately:
  *   - [[graft.ops.Windows.userSessions]]    — batch lag/cumsum (oracle form);
  *   - [[graft.ops.Windows.sessionWindowCounts]] — native `session_window`;
  *   - this one — hand-managed state, for semantics the built-ins can't
  *     express (emit-on-close output, per-session payloads, custom
  *     timeout policy).
  *
  * Semantics: events are processed per user in event-time order within
  * each micro-batch; a gap > `gapSec` closes the open session. A closed
  * session is emitted EXACTLY ONCE, either when a later event proves the
  * gap inside a batch, or when the watermark passes `end + gap` (event-
  * time timeout) — the streaming-native "session ended" signal. Rows
  * later than the watermark allows are dropped by the watermark itself;
  * in-watermark out-of-order events merge into the open session
  * (min-start/max-end) but cannot re-split one — the documented
  * trade-off of single-open-session state (use `session_window` when
  * full out-of-order merging matters).
  *
  * Scale: state per user is ONE fixed-size [[StatefulSessions.OpenSession]]
  * (three longs) regardless of event volume; eviction is by event-time
  * timeout, so idle keys leave the store as the watermark advances.
  * The shuffle is the groupByKey on user_id — the same single exchange
  * the batch form pays.
  */
object StatefulSessions {

  final case class SessionEvent(user_id: Long, sec: Long, event_time: Timestamp)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long)

  val DefaultGapSec = 1800L

  /** Streaming form: `rows` must have `user_id` and epoch-second `sec`
    * columns. Closed sessions are emitted in Append mode; open sessions
    * are held in state until their event-time timeout fires. */
  def sessionizeStream(rows: DataFrame, gapSec: Long = DefaultGapSec,
                       watermark: String = "2 minutes"): Dataset[Session] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col("user_id").cast("long").as("user_id"),
        col("sec").cast("long").as("sec"),
        col("sec").cast("timestamp").as("event_time"))
      .withWatermark("event_time", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapSec, emitOpen = false))
  }

  /** Batch twin: the same state function over a complete input, emitting
    * the trailing open session too (a batch IS the whole history). Used
    * for oracle checks and cross-validation against the lag/cumsum form. */
  def sessionizeBatch(events: DataFrame, gapSec: Long = DefaultGapSec): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("long").as("sec"),
        col("ts").cast("timestamp").as("event_time"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(gapSec, emitOpen = true))
  }

  /** The state-transition function. `emitOpen` selects the batch
    * semantics (flush the open session, keep no state). */
  private def update(gapSec: Long, emitOpen: Boolean)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.start, s.end, s.n))
    } else {
      val secs = events.map(_.sec).toArray
      java.util.Arrays.sort(secs)
      val out = Vector.newBuilder[Session]
      var open = state.getOption
      secs.foreach { sec =>
        open = open match {
          case Some(s) if sec - s.end > gapSec =>
            out += Session(userId, s.start, s.end, s.n)
            Some(OpenSession(sec, sec, 1L))
          case Some(s) =>
            Some(OpenSession(math.min(s.start, sec), math.max(s.end, sec), s.n + 1))
          case None =>
            Some(OpenSession(sec, sec, 1L))
        }
      }
      open.foreach { s =>
        if (emitOpen) {
          out += Session(userId, s.start, s.end, s.n)
          if (state.exists) state.remove()
        } else {
          state.update(s)
          // fire when the watermark passes end + gap; clamp above the
          // current watermark so a session inherited from old state can
          // never set an already-expired (= rejected) timeout
          state.setTimeoutTimestamp(math.max(
            (s.end + gapSec) * 1000L + 1000L,
            state.getCurrentWatermarkMs() + 1000L))
        }
      }
      out.result().iterator
    }
  }
}
