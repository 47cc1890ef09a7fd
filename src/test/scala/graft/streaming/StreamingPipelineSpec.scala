package graft.streaming

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The 100 TB training-data pipeline composed END TO END from the
  * round-9 streaming surface: a versioned document lake tailed with
  * `readStream.format("graft")`, each micro-batch exact-deduped
  * against a fingerprint INDEX table (in-batch first-wins + anti-join
  * — O(batch + probe), the d9 shape), survivors landed in a CLEAN
  * lake and their fingerprints in the index, both exactly-once
  * (txn-watermark keyed by the engine batch id). The invariant: after
  * any sequence of producer commits and a consumer RESTART, the clean
  * lake equals the one-shot dedup of everything produced (first
  * occurrence by id wins), and nothing is delivered twice.
  */
class StreamingPipelineSpec extends SparkSpec {

  test("doc lake tail -> incremental dedup -> exactly-once clean lake == one-shot") {
    val s = spark
    import s.implicits._
    val raw = graft.TempDirs.create("pipe-raw")
    val clean = graft.TempDirs.create("pipe-clean")
    val index = graft.TempDirs.create("pipe-index")
    val ckpt = graft.TempDirs.create("pipe-ckpt")

    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    // batch 0: two duplicate texts inside the batch
    Snapshots.commit(docs(
      1L -> "the quick brown fox", 2L -> "unique alpha",
      3L -> "the quick brown fox"), raw)

    def runConsumer(): Unit = {
      val q = spark.readStream.format("graft").load(raw)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val b = org.apache.spark.sql.graftbridge.Bridge.batchFrom(batch)
            .withColumn("fp", sha2(col("text"), 256))
          // in-batch first-wins, then anti-join the fingerprint index
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("fp").orderBy("doc_id")
          val firstInBatch = b
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          val known =
            if (Snapshots.latestVersion(spark, index).isEmpty)
              firstInBatch.select("fp").limit(0)
            else Snapshots.readVersion(spark, index)
          val fresh = firstInBatch.join(known, Seq("fp"), "left_anti")
            .persist()
          try {
            // two exactly-once appends keyed by the SAME batch id: a
            // replayed micro-batch no-ops on both watermarks
            Snapshots.exactlyOnceSink(clean, "clean")(
              fresh.select("doc_id", "text"), id)
            Snapshots.exactlyOnceSink(index, "index")(
              fresh.select("fp"), id)
          } finally fresh.unpersist(false)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runConsumer()
    // batch 1 appends: one cross-batch duplicate, one new doc
    Snapshots.commit(docs(
      4L -> "unique alpha", 5L -> "unique beta"), raw, "append")
    // consumer RESTART from the checkpoint (only v1 arrives)
    runConsumer()
    // a replayed producer commit must not re-deliver: restart again
    // with no new source commits
    runConsumer()

    val got = Snapshots.readVersion(spark, clean)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // one-shot dedup of everything produced, first doc_id wins
    val expected = Set(
      1L -> "the quick brown fox", 2L -> "unique alpha",
      5L -> "unique beta")
    assert(got === expected)
    // the index holds exactly the distinct fingerprints
    assert(Snapshots.readVersion(spark, index).distinct().count() === 3L)
    assert(Snapshots.readVersion(spark, index).count() === 3L)
  }
}
