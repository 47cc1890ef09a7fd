package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming dedup within watermark + stream-static enrichment. */
class StreamingDedupSpec extends SparkSpec {

  private val Base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  test("duplicate event_ids within the watermark horizon are dropped") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.dedupWithinWatermark(
      input.toDF().toDF("event_id", "ts", "payload"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      // same batch AND later batch duplicates within horizon
      input.addData((2L, ts(3), "b-dup"), (3L, ts(4), "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.sql("SELECT event_id FROM dedup_stream ORDER BY event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment joins the dimension without state") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val dim = Seq((10L, "gold"), (20L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long)]
    val enriched = StreamingDedup.enrichWithDim(
      input.toDF().toDF("event_id", "user_id"), dim, "user_id")
    val q = enriched.writeStream.format("memory")
      .queryName("enriched_stream").outputMode("append").start()
    try {
      input.addData((1L, 10L), (2L, 20L), (3L, 99L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(
      "SELECT event_id, tier FROM enriched_stream ORDER BY event_id").collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq ===
      Seq(Some("gold"), Some("silver"), None))
  }
}
