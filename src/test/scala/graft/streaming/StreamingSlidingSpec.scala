package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming ≡ batch equivalence for the sliding-window aggregate,
  * plus the 4-windows-per-event invariant shared with the batch twin
  * (CorpusQueries.q36SlidingWindow).
  */
class StreamingSlidingSpec extends SparkSpec {

  private val Base = 1700000000000L // 2023-11-14 22:13:20 UTC
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  private val events = Seq(
    (ts(0), "click", 1.0),
    (ts(5), "click", 2.0),
    (ts(20), "view", 3.0),
    (ts(65), "click", 4.0))

  test("streaming sliding counts (complete mode) == batch plan") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = StreamingSliding.slidingCounts(
      input.toDF().toDF("ts", "event_type", "value"))
    val q = stream.writeStream.format("memory")
      .queryName("sliding_stream").outputMode("complete").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT * FROM sliding_stream ORDER BY ws, event_type").collect()
    val want = StreamingSliding.slidingCountsBatch(
      events.toDF("ts", "event_type", "value"))
      .orderBy("ws", "event_type").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (a, b) => assert(a === b) }
    // every event lands in exactly 4 (window, type) memberships
    assert(got.map(_.getAs[Long]("n")).sum === events.length * 4L)
  }
}
