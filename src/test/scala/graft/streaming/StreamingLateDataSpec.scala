package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Late-data contract of the sessionizer: events older than the
  * watermark are DROPPED (never mutate an already-reported session),
  * and the stream output equals the batch window-function formulation
  * (q19Sessions semantics) computed on the on-time subset only.
  * This pins the one area the DuckDB oracle can't reach — the oracle
  * sees a static table, so stream-vs-batch equivalence under late
  * arrivals has to be asserted here.
  */
class StreamingLateDataSpec extends SparkSpec {

  private val Base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  /** Batch twin of the sessionizer (q19's lag/cumsum formulation) over
    * an explicit (user_id, ts) frame: one row per session.
    */
  private def batchSessions(events: DataFrame): Set[(Long, Long, Long, Long)] = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_sess",
        (col("prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev")) > StreamingSessions.GapMs)
          .cast("int"))
      .withColumn("sess_id", sum("new_sess").over(run))
      .groupBy("user_id", "sess_id")
      .agg(unix_millis(min("ts")).as("start_ms"),
        unix_millis(max("ts")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("n_events")))
      .toSet
  }

  test("late events beyond the watermark are dropped; stream equals batch on the on-time subset") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Timestamp)]
    val q = StreamingSessions.sessionize(input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("late_sess")
      .outputMode("append").start()

    val onTimeA = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(20)), (2L, ts(5)), (2L, ts(15)))
    val onTimeB = Seq((1L, ts(120)))
    // arrive AFTER the watermark has passed t=110: both would extend
    // already-closed sessions if they were (incorrectly) admitted
    val late = Seq((1L, ts(30)), (2L, ts(12)))
    val flushers = Seq((9L, ts(1000)), (9L, ts(2000)))
    try {
      input.addData(onTimeA)
      q.processAllAvailable() // watermark -> t=10
      input.addData(onTimeB)
      q.processAllAvailable() // watermark -> t=110
      input.addData(late)
      q.processAllAvailable() // both rows older than watermark: dropped
      flushers.foreach { f => input.addData(f); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.sql("SELECT user_id, start_ms, end_ms, n_events FROM late_sess")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // ground truth: batch formulation over ONLY the on-time events,
    // restricted to sessions the final watermark (t=1990) has closed
    val finalWatermarkMs = ts(2000).getTime - 10L * 60000
    val onTime = (onTimeA ++ onTimeB ++ flushers).toDF("user_id", "ts")
    val expected = batchSessions(onTime)
      .filter { case (_, _, end, _) => end + StreamingSessions.GapMs <= finalWatermarkMs }
    assert(got === expected)

    // and the twin over ALL events (late included) differs — i.e. the
    // late rows would have changed reported sessions had they not been
    // dropped, so the equality above is evidence of dropping, not luck
    val withLate = (onTimeA ++ onTimeB ++ late ++ flushers).toDF("user_id", "ts")
    val contaminated = batchSessions(withLate)
      .filter { case (_, _, end, _) => end + StreamingSessions.GapMs <= finalWatermarkMs }
    assert(contaminated !== expected, "late rows must be material to the twin")
  }
}
