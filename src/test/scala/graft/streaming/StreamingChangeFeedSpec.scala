package graft.streaming

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Streaming change-data-feed: [[Snapshots.streamChangeFeed]] tails the
  * manifest dir as a file source and [[Snapshots.changeFeedBatches]]
  * turns each micro-batch of commit versions into a readChangeFeed
  * slice — the delete-aware sibling of streamAppends. The core
  * assertion is stream == batch: the union of streamed slices over a
  * commit sequence equals ONE readChangeFeed call over the same range.
  */
class StreamingChangeFeedSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-stream-cdf")

  private def frame(ids: Range, tag: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("streamed CDF slices over a commit sequence == one readChangeFeed call") {
    val dir = freshDir()
    val ckpt = graft.TempDirs.create("graft-stream-cdf-ckpt")
    Snapshots.commit(frame(0 until 20, "base"), dir) // v0
    val slices = ArrayBuffer.empty[(Long, Long, Seq[(Long, String, String)])]
    def startQuery() = Snapshots.streamChangeFeed(spark, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Snapshots.changeFeedBatches(dir) { (feed, from, to) =>
        val rows = feed.select("id", "tag", "_change_type").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        slices.synchronized { slices += ((from, to, rows)) }
      } _)
      .start()
    val q = startQuery()
    try {
      // fresh checkpoint: the first slice is the full snapshot as
      // inserts (fromVersion = -1) — initial load, then tail
      q.processAllAvailable()
      assert(slices.map(s => (s._1, s._2)) === Seq((-1L, 0L)))
      assert(slices.head._3.size === 20 &&
        slices.head._3.forall(_._3 === "insert"))
      // the tail: an append, a delete (v0 rows only), another append
      Snapshots.commit(frame(20 until 30, "late"), dir, "append") // v1
      Snapshots.deleteWhere(spark, dir,
        col("id") % 4 === 0L && col("id") < 20L)                  // v2
      Snapshots.commit(frame(30 until 35, "late2"), dir, "append") // v3
      q.processAllAvailable()
    } finally q.stop()
    // maxFilesPerTrigger=1: one slice per commit, in commit order
    assert(slices.map(s => (s._1, s._2)) ===
      Seq((-1L, 0L), (0L, 1L), (1L, 2L), (2L, 3L)))
    // deletes are FULL rows (provenance readback), not just keys
    val streamedTail = slices.drop(1).flatMap(_._3)
    assert(streamedTail.filter(_._3 == "delete").forall(_._2 == "base"))
    // stream == batch: the streamed tail equals ONE feed call over
    // the whole range (deletes touch only v0 files, so nothing in the
    // fused range nets out and multiset equality holds exactly)
    val oneCall = Snapshots.readChangeFeed(spark, dir, 0L, 3L)
      .select("id", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(streamedTail.sorted === oneCall.sorted)
  }

  test("replicaSink: exactly-once replica == source across merges, deletes, restarts") {
    val s = spark
    import s.implicits._
    val src = freshDir()
    val dst = freshDir()
    val ckpt = graft.TempDirs.create("graft-stream-replica-ckpt")
    Snapshots.commit(frame(0 until 50, "base"), src) // v0
    def rows(d: String) = Snapshots.readVersion(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def query() = Snapshots.streamChangeFeed(spark, src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Snapshots.replicaSink(src, dst, "id") _)
      .start()
    val q1 = query()
    try {
      // initial load: the full snapshot bootstraps the replica
      q1.processAllAvailable()
      assert(rows(dst) === rows(src))
      // a mergeOnRead UPDATE puts delete(old)+insert(new) of the SAME
      // key in one slice — must collapse to U, not fan out; plus a
      // pure delete, an upsert-insert, an append, and a later delete
      Snapshots.mergeOnRead(spark, src,
        Seq((1L, "upd", "U"), (2L, "", "D"), (100L, "new", "I"))
          .toDF("id", "tag", "op"), "id")                       // v1
      Snapshots.commit(frame(200 until 210, "late"), src, "append") // v2
      Snapshots.deleteWhere(spark, src, col("id") >= 205L)      // v3
      q1.processAllAvailable()
      assert(rows(dst) === rows(src))
      assert(rows(dst).contains((1L, "upd")) && !rows(dst).exists(_._1 == 2L))
    } finally q1.stop()
    // commits landing while the consumer is down arrive on restart
    Snapshots.mergeOnRead(spark, src,
      Seq((3L, "upd2", "U")).toDF("id", "tag", "op"), "id")     // v4
    val q2 = query()
    try {
      q2.processAllAvailable()
      assert(rows(dst) === rows(src))
    } finally q2.stop()
    // a REPLAYED slice (failure between apply and checkpoint write)
    // no-ops on the replica's txn watermark: exactly-once
    val before = Snapshots.latestVersion(spark, dst)
    Snapshots.replicaSink(src, dst, "id")(Seq(4L).toDF("version"), 99L)
    assert(Snapshots.latestVersion(spark, dst) === before)
    assert(rows(dst) === rows(src))
  }

  test("metadata-only commits are skipped; a restarted consumer resumes, no redelivery") {
    val dir = freshDir()
    val ckpt = graft.TempDirs.create("graft-stream-cdf-ckpt2")
    Snapshots.commit(frame(0 until 10, "base"), dir) // v0
    val slices = ArrayBuffer.empty[(Long, Long, Long)] // (from, to, nRows)
    def query() = Snapshots.streamChangeFeed(spark, dir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Snapshots.changeFeedBatches(dir) { (feed, from, to) =>
        val n = feed.count()
        slices.synchronized { slices += ((from, to, n)) }
      } _)
      .start()
    val q1 = query()
    try {
      q1.processAllAvailable()
      // a CHECK add is a metadata-only commit: discovered, but no slice
      Snapshots.addCheckConstraint(spark, dir, "id_ok", "id >= 0") // v1
      q1.processAllAvailable()
      assert(slices.toSeq === Seq((-1L, 0L, 10L)))
    } finally q1.stop()
    // commits landing while the consumer is DOWN arrive on restart
    // from the checkpoint — and nothing already consumed re-delivers
    Snapshots.deleteWhere(spark, dir, col("id") < 3L) // v2
    val q2 = query()
    try q2.processAllAvailable() finally q2.stop()
    assert(slices.toSeq === Seq((-1L, 0L, 10L), (1L, 2L, 3L)))
  }
}
