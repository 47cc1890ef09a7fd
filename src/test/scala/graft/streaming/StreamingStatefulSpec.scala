package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState running totals: stream==batch equivalence and
  * cross-batch state carry. Requires the RocksDB state store provider
  * (the API's target store); the conf is scoped to this suite.
  */
class StreamingStatefulSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("running totals accumulate across batches and match the batch aggregate") {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sqlCtx = spark.sqlContext
      import spark.implicits._
      implicit val sq = sqlCtx
      val input = MemoryStream[(Long, Long)]
      val q = StreamingStateful.runningTotals(input.toDS())
        .toDF("key", "n", "total")
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update").start()
      val data = Seq(
        Seq(10L -> 5L, 20L -> 7L, 10L -> 1L),
        Seq(10L -> 2L, 30L -> 9L),
        Seq(20L -> 3L, 30L -> 1L, 10L -> 4L))
      try {
        data.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
      } finally q.stop()
      // latest emission per key == batch aggregate over all input
      val got = spark.sql(
        """SELECT key, max(n) AS n, max(total) AS total
          |FROM running_totals GROUP BY key ORDER BY key""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = data.flatten.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, vs) => (k, vs.size.toLong, vs.map(_._2).sum) }
      assert(got === want)
      // update mode emitted one row per (key, batch-it-appeared-in)
      val emissions = spark.sql("SELECT COUNT(*) FROM running_totals")
        .head.getLong(0)
      assert(emissions === 7L) // 10: 3 batches, 20: 2, 30: 2
      // and the mid-stream state was really carried: key 10's running
      // n after batch 2 was 3 (not re-started)
      val key10 = spark.sql(
        "SELECT n FROM running_totals WHERE key = 10 ORDER BY n")
        .collect().map(_.getLong(0)).toSeq
      assert(key10 === Seq(2L, 3L, 4L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
