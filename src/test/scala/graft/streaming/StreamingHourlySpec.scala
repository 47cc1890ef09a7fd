package graft.streaming

import graft.SparkSpec
import graft.logs.LogFixture
import java.nio.file.Files

/** Streaming ≡ batch equivalence: the streaming hourly fact in complete
  * mode over the fixture must equal the batch execution of the same
  * windowed plan (no reference ground truth exists for streaming —
  * SURVEY.md §7.3 prescribes batch-equivalence testing).
  */
class StreamingHourlySpec extends SparkSpec {

  test("streaming hourly fact (complete mode) == batch windowed fact") {
    val stg = LogFixture.stg(spark)
    val dir = Files.createTempDirectory("stgstream").toString
    stg.write.mode("overwrite").parquet(dir)

    val stream = StreamingHourly.hourlyFact(
      StreamingHourly.readStgStream(spark, dir, stg.schema))
    val q = stream.writeStream
      .format("memory")
      .queryName("hourly_stream")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql(
      "SELECT * FROM hourly_stream ORDER BY date, hour, endpoint").collect()
    val want = StreamingHourly.hourlyFactBatch(stg)
      .orderBy("date", "hour", "endpoint").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (a, b) => assert(a === b) }
    // sanity vs the golden fixture: 6 (date,hour,endpoint) groups
    assert(got.length === 6)
  }
}
