package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join: matches only clicks in the 30-minute
  * band after a purchase, and agrees with the equivalent batch join.
  */
class StreamingJoinSpec extends SparkSpec {

  private val Base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  // (event_id, user_id, ts, event_type, value)
  private val events = Seq(
    (1L, 7L, ts(0), "purchase", 0.0),
    (2L, 7L, ts(10), "click", 1.5),   // in band (10 min after)
    (3L, 7L, ts(29), "click", 2.5),   // in band (29 min after)
    (4L, 7L, ts(31), "click", 3.5),   // out of band (31 min after)
    (5L, 8L, ts(10), "click", 9.9),   // other user
    (6L, 9L, ts(5), "purchase", 0.0)  // purchase with no clicks
  )

  test("streaming matches equal the batch interval join") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val joined = StreamingJoin.purchaseClickMatches(
      input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
    val q = joined.writeStream.format("memory")
      .queryName("pc_matches").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT purchase_id, user_id, value FROM pc_matches ORDER BY purchase_id, value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 7L, 1.5), (1L, 7L, 2.5)))
  }

  test("watermark advance evicts buffered join state (bounded state)") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val joined = StreamingJoin.purchaseClickMatches(
      input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
      delay = "10 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("pc_state").outputMode("append").start()
    try {
      // buffer a purchase + clicks
      input.addData((1L, 7L, ts(0), "purchase", 0.0),
        (2L, 7L, ts(10), "click", 1.5), (3L, 7L, ts(20), "click", 2.5))
      q.processAllAvailable()
      val buffered = q.lastProgress.stateOperators(0).numRowsTotal
      assert(buffered >= 3, s"expected all rows buffered, got $buffered")
      // jump event time far ahead on BOTH sides (each side's watermark
      // advances only on rows that survive its own filter), then one
      // more batch: Spark applies the new watermark one batch later
      input.addData((4L, 99L, ts(10000), "purchase", 0.0),
        (5L, 99L, ts(10000), "click", 0.0))
      q.processAllAvailable()
      input.addData((6L, 98L, ts(10001), "purchase", 0.0),
        (7L, 98L, ts(10001), "click", 0.0))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      assert(removed >= 3, s"watermark advance must evict the old rows (removed=$removed)")
      val remaining = q.lastProgress.stateOperators(0).numRowsTotal
      assert(remaining <= 4, s"state must hold only in-horizon rows, got $remaining")
    } finally q.stop()
  }

  test("a click older than the watermark is dropped, not matched") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val joined = StreamingJoin.purchaseClickMatches(
      input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
      delay = "10 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("pc_late").outputMode("append").start()
    try {
      input.addData((1L, 7L, ts(0), "purchase", 0.0),
        (2L, 7L, ts(10), "click", 1.5))
      q.processAllAvailable() // emits the on-time match
      // advance the watermark well past the purchase band (two batches:
      // watermark takes effect one batch after the data that moves it)
      input.addData((3L, 99L, ts(10000), "purchase", 0.0),
        (4L, 99L, ts(10000), "click", 0.0))
      q.processAllAvailable()
      input.addData((5L, 98L, ts(10001), "purchase", 0.0),
        (6L, 98L, ts(10001), "click", 0.0))
      q.processAllAvailable()
      // in-band for the t0 purchase, but hours behind the watermark:
      // must be dropped at the state store boundary, not matched
      input.addData((8L, 7L, ts(15), "click", 9.9))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT value FROM pc_late ORDER BY value")
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(1.5), s"late click must not produce a match: $got")
  }

  test("the join is planned with state eviction (watermark-bounded)") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val joined = StreamingJoin.purchaseClickMatches(
      input.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"))
    // analysis must accept it as a valid append-mode stream-stream join
    // (unbounded-state interval joins are rejected at start())
    val q = joined.writeStream.format("memory")
      .queryName("pc_plan").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(q.exception.isEmpty)
  }
}
