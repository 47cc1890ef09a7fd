package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** foreachBatch sink: the streaming → partitioned-lake ingestion path.
  * Each micro-batch lands as date-partitioned parquet with dynamic
  * partition overwrite — the idempotent-reprocessing layout the batch
  * LogLake uses, now fed by a stream.
  */
class StreamingSinkSpec extends SparkSpec {

  private val Base = 1700000000000L
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  test("foreachBatch writes date-partitioned parquet; partitions are re-readable") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val out = java.nio.file.Files.createTempDirectory("graft-stream-lake").toString
    val input = MemoryStream[(Long, Timestamp, Double)]
    val stream = input.toDF().toDF("event_id", "ts", "value")
      .withColumn("date", to_date(col("ts")))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("date")
          .parquet(out)
      }
      .start()
    try {
      input.addData((1L, ts(0), 1.0), (2L, ts(24 * 60), 2.0))
      q.processAllAvailable()
      input.addData((3L, ts(2 * 24 * 60), 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val lake = spark.read.parquet(out)
    // dynamic overwrite: batch 2 must NOT have clobbered batch 1's dates
    assert(lake.count() === 3)
    assert(lake.select("date").distinct().count() === 3)
    // partition pruning reaches the scan on the re-read
    val pruned = lake.filter(col("date") === to_date(lit("2023-11-14")))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") && !scan.contains("PartitionFilters: []"),
      scan.take(1500))
  }

  test("serve-layer caching: cached fact serves from InMemoryTableScan") {
    val sf = "/root/testdata/sf0.001"
    val fct = graft.Tables.orders(spark, sf)
      .groupBy("o_orderstatus").count()
    fct.createOrReplaceTempView("v_served_fct")
    spark.catalog.cacheTable("v_served_fct")
    try {
      val served = spark.table("v_served_fct").filter(col("count") > 0)
      served.collect() // populate the cache
      val plan = served.queryExecution.executedPlan.toString
      // Spark 4 renders the cached scan as "Scan In-memory table" over
      // an InMemoryRelation (TableCacheQueryStage under AQE)
      assert(plan.contains("In-memory table") || plan.contains("InMemoryTableScan"),
        plan.take(1500))
    } finally spark.catalog.uncacheTable("v_served_fct")
  }
}
