package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful streaming: per-user sessionization with
  * flatMapGroupsWithState (SURVEY.md §7.2 M4 — the one operator family
  * where built-in windowed aggs genuinely can't express the semantics:
  * a session ends on a 30-minute inactivity GAP, not on a fixed grid).
  *
  * State per user is O(1) (last-seen time + open-session accumulator),
  * keyed by user_id — scales with |active users|, not event volume.
  * Event-time timeout (driven by the watermark) closes idle sessions so
  * state cannot grow unboundedly on an infinite stream.
  */
object StreamingSessions {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start_ms: Long, last_ms: Long, n_events: Long)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                              n_events: Long, duration_ms: Long)

  val GapMs: Long = 30L * 60 * 1000 // 30 min inactivity gap

  /** Group handler: emits a SessionOut whenever a gap (or timeout)
    * closes a session; keeps the open session in state otherwise.
    */
  def handle(userId: Long, events: Iterator[Event],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
    var closed = List.empty[SessionOut]
    var cur = state.getOption
    if (state.hasTimedOut) {
      cur.foreach { s =>
        closed ::= SessionOut(userId, s.start_ms, s.last_ms, s.n_events,
          s.last_ms - s.start_ms)
      }
      state.remove()
      cur = None
    }
    // a late-but-admissible event more than GapMs BEFORE the open
    // session's start belongs to a SEPARATE earlier session under gap
    // semantics (merging it would widen across a gap the batch twin
    // splits on). Assemble such events in their own accumulator;
    // because events are processed in ascending order, the gap test
    // between the early run and the (start-widened) open session is
    // exactly the batch gap rule. The early session is emitted at
    // batch end — state stays O(1); the one documented divergence is
    // an admissible event in a LATER batch that would have extended
    // the already-emitted early session.
    var early: Option[SessionState] = None
    def emit(s: SessionState): Unit =
      closed ::= SessionOut(userId, s.start_ms, s.last_ms, s.n_events,
        s.last_ms - s.start_ms)
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t >= s.start_ms - GapMs && t - s.last_ms <= GapMs =>
          // an admissible event may still be EARLIER than the stored
          // state (late relative to this key's last event but at/above
          // the watermark, so not dropped): session bounds only ever
          // widen — a naive `last_ms = t` would move the end BACKWARD,
          // yielding negative durations and premature timeouts, and
          // diverge from the batch twin's min/max formulation
          cur = Some(s.copy(start_ms = math.min(s.start_ms, t),
            last_ms = math.max(s.last_ms, t), n_events = s.n_events + 1))
        case Some(s) if t - s.last_ms > GapMs =>
          // a LATER session: flush the early run (older) then the open
          // session, in timeline order
          early.foreach(emit); early = None
          emit(s)
          cur = Some(SessionState(t, t, 1))
        case Some(_) =>
          // t < open.start - GapMs: earlier-session run
          early = early match {
            case Some(es) if t >= es.start_ms - GapMs && t - es.last_ms <= GapMs =>
              Some(es.copy(start_ms = math.min(es.start_ms, t),
                last_ms = math.max(es.last_ms, t), n_events = es.n_events + 1))
            case Some(es) => emit(es); Some(SessionState(t, t, 1))
            case None => Some(SessionState(t, t, 1))
          }
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    // the early run is > GapMs before the open session by construction
    // (events at/above open.start - GapMs merged into it instead)
    early.foreach(emit)
    cur.foreach { s =>
      state.update(s)
      if (!state.hasTimedOut)
        state.setTimeoutTimestamp(s.last_ms + GapMs)
    }
    closed.reverseIterator
  }

  /** events stream (user_id, ts) → closed-session stream. Watermark on
    * ts drives the event-time timeout; sessions idle past the gap +
    * watermark delay are flushed.
    */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(handle)
  }
}
