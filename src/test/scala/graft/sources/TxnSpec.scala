package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-table transactions: two-phase commit over pending manifests
  * and one atomic decision marker. Pins the protocol edges the u22
  * oracle cannot see — version accounting, explicit-version refusals,
  * the force-abort race, phase-1 self-abort, and the change feed
  * skipping dead versions.
  */
class TxnSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-txn-spec")

  private def frame(ids: Range, tag: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("commitTxn: both tables become visible atomically, versions returned") {
    val (t1, t2, txn) = (freshDir(), freshDir(), freshDir())
    val vs = Snapshots.commitTxn(Seq(
      (frame(0 until 10, "a"), t1, "overwrite"),
      (frame(0 until 5, "b"), t2, "overwrite")), txn)
    assert(vs === Seq(0L, 0L))
    assert(Snapshots.readVersion(spark, t1).count() === 10L)
    assert(Snapshots.readVersion(spark, t2).count() === 5L)
    // a second txn lands as v1 on both
    val vs2 = Snapshots.commitTxn(Seq(
      (frame(10 until 12, "a2"), t1, "append"),
      (frame(5 until 6, "b2"), t2, "append")), txn)
    assert(vs2 === Seq(1L, 1L))
    assert(Snapshots.readVersion(spark, t1).count() === 12L)
    assert(Snapshots.readVersion(spark, t2).count() === 6L)
  }

  test("a crashed txn (no marker) is invisible; explicit reads of it throw") {
    val (t1, txn) = (freshDir(), freshDir())
    Snapshots.commit(frame(0 until 10, "seed"), t1)
    val marker = new org.apache.hadoop.fs.Path(txn, "dead.final").toString
    Snapshots.commit(frame(100 until 105, "torn"), t1, "append",
      pending = Some(marker))
    // latest-read resolves past the in-flight head
    assert(Snapshots.readVersion(spark, t1).count() === 10L)
    assert(Snapshots.readVersionKeys(spark, t1, "id", Seq(3L)).count() === 1L)
    assert(Snapshots.readVersionKeys(spark, t1, "id", Seq(101L)).count() === 0L)
    // explicit read of the uncommitted version is refused
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t1, Some(1L)).count()
    }
    // a plain writer proceeding force-aborts the corpse and lands at v2
    assert(Snapshots.commit(frame(200 until 202, "live"), t1, "append") === 2L)
    assert(Snapshots.readVersion(spark, t1).count() === 12L) // 10 + 2, not +5
    // the torn version is now DECIDED dead, permanently
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t1, Some(1L)).count()
    }
    // ...and a late arrival of the crashed committer cannot resurrect it
    assert(!Snapshots.readVersion(spark, t1).columns.isEmpty)
  }

  test("phase-1 failure self-aborts the whole txn: no table moves") {
    val (t1, t2, txn) = (freshDir(), freshDir(), freshDir())
    Snapshots.commit(frame(0 until 10, "s1"), t1)
    Snapshots.commit(frame(0 until 10, "s2"), t2)
    Snapshots.addCheckConstraint(spark, t2, "small_ids", "id < 1000")
    // t1's part publishes its pending manifest, then t2's part is
    // refused by the CHECK — the txn must die as a WHOLE: the marker
    // is decided "abort", so t1's already-published part is dead
    intercept[IllegalArgumentException] {
      Snapshots.commitTxn(Seq(
        (frame(100 until 103, "x"), t1, "append"),
        (frame(5000 until 5003, "x"), t2, "append")), txn)
    }
    assert(Snapshots.readVersion(spark, t1).count() === 10L)
    assert(Snapshots.readVersion(spark, t2).count() === 10L)
    // t1's poisoned version number is burned and permanently dead
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t1, Some(1L)).count()
    }
    // both tables keep working on the live lineage
    assert(Snapshots.commit(frame(20 until 22, "ok"), t1, "append") === 2L)
    assert(Snapshots.readVersion(spark, t1).count() === 12L)
  }

  test("txn over the change feed: dead versions never surface as rows") {
    val (t1, txn) = (freshDir(), freshDir())
    Snapshots.commit(frame(0 until 10, "seed"), t1)
    val marker = new org.apache.hadoop.fs.Path(txn, "dead2.final").toString
    Snapshots.commit(frame(100 until 110, "torn"), t1, "append",
      pending = Some(marker))
    Snapshots.commit(frame(10 until 13, "live"), t1, "append") // v2, aborts v1
    val feed = Snapshots.readChangeFeed(spark, t1, 0L, 2L)
    val inserted = feed.filter(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(inserted === Array(10L, 11L, 12L)) // torn batch absent
    // a dead endpoint is refused outright
    intercept[IllegalArgumentException] {
      Snapshots.readChangeFeed(spark, t1, 1L, 2L)
    }
  }

  test("vacuumAborted reclaims decided-abort files, never shared or in-flight ones") {
    val (t1, txn) = (freshDir(), freshDir())
    Snapshots.commit(frame(0 until 10, "seed"), t1)
    val m1 = new org.apache.hadoop.fs.Path(txn, "a.final").toString
    // an aborted APPEND: its manifest carries the seed files by
    // reference — those must survive reclamation
    Snapshots.commit(frame(100 until 110, "torn"), t1, "append",
      pending = Some(m1))
    Snapshots.commit(frame(10 until 12, "live"), t1, "append") // aborts v1
    // an IN-FLIGHT txn (undecided): must not be touched
    val m2 = new org.apache.hadoop.fs.Path(txn, "b.final").toString
    Snapshots.commit(frame(200 until 205, "inflight"), t1, "append",
      pending = Some(m2))
    val n = Snapshots.vacuumAborted(spark, t1)
    assert(n >= 1) // the torn batch's own files went
    // table intact, history intact, in-flight batch still pending
    assert(Snapshots.readVersion(spark, t1).count() === 12L)
    assert(Snapshots.readVersion(spark, t1, Some(0L)).count() === 10L)
    // the dead manifest still exists and still refuses reads
    assert(Snapshots.readManifest(spark, t1, 1L).pendingMarker.nonEmpty)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t1, Some(1L)).count()
    }
    // the in-flight txn can still commit afterwards — its files live
    assert(Snapshots.vacuumAborted(spark, t1) === 0) // idempotent
  }

  test("fastCount serves the visible count from the ledger without a Spark job") {
    val t1 = freshDir()
    Snapshots.commit(frame(0 until 100, "seed"), t1)
    Snapshots.deleteWhere(spark, t1, col("id") % 10 === 3L) // mask 10
    Snapshots.commit(frame(200 until 220, "more"), t1, "append")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val c2 = Snapshots.fastCount(spark, t1)
      val c1 = Snapshots.fastCount(spark, t1, Some(1L))
      val c0 = Snapshots.fastCount(spark, t1, Some(0L))
      Thread.sleep(300) // let any (unexpected) job-start events drain
      assert((c0, c1, c2) === ((100L, 90L, 110L)))
      assert(jobs === 0, "fastCount must not run a Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and it agrees with the real scan
    assert(Snapshots.fastCount(spark, t1) ===
      Snapshots.readVersion(spark, t1).count())
  }

  test("file-level change APIs refuse dead endpoints; feed boundary cases are exact") {
    val (t1, txn) = (freshDir(), freshDir())
    Snapshots.commit(frame(0 until 10, "seed"), t1)
    val marker = new org.apache.hadoop.fs.Path(txn, "d4.final").toString
    Snapshots.commit(frame(100 until 105, "torn"), t1, "append",
      pending = Some(marker))
    Snapshots.commit(frame(10 until 12, "live"), t1, "append") // v2, aborts v1
    // the file-level siblings hold the same liveness contract as the
    // row-level feed: a dead endpoint never serves
    intercept[IllegalArgumentException] {
      Snapshots.addedFiles(spark, t1, 1L, 2L)
    }
    intercept[IllegalArgumentException] {
      Snapshots.readChanges(spark, t1, 0L, 1L).count()
    }
    assert(Snapshots.readChanges(spark, t1, 0L, 2L).count() === 2L) // live slice
    // feed fallback: a checkpoint whose whole prefix was aborted txns
    // (floor still 0) restarts from the true beginning — exact
    val (t2, txn2) = (freshDir(), freshDir())
    val m2 = new org.apache.hadoop.fs.Path(txn2, "d5.final").toString
    Snapshots.commit(frame(500 until 505, "torn0"), t2, "overwrite",
      pending = Some(m2))
    Snapshots.commit(frame(0 until 7, "live"), t2, "overwrite") // v1, aborts v0
    var got = -1L
    val s = spark
    import s.implicits._
    Snapshots.changeFeedBatches(t2) { (df, _, _) => got = df.count() }(
      Seq(0L, 1L).toDF("version"), 0L)
    assert(got === 7L) // from resolved to -1: the full live snapshot, once
    // feed checkpoint BELOW the vacuum floor: loud failure, never a
    // silent full re-delivery
    val t3 = freshDir()
    Snapshots.commit(frame(0 until 5, "a"), t3)
    Snapshots.commit(frame(5 until 8, "b"), t3, "append")
    Snapshots.commit(frame(8 until 9, "c"), t3, "append")
    Snapshots.vacuum(spark, t3, 2L)
    intercept[IllegalArgumentException] {
      Snapshots.changeFeedBatches(t3) { (_, _, _) => () }(
        Seq(2L).toDF("version"), 0L) // fromRaw = 1 < floor = 2
    }
  }

  test("feed grace: an undecided head is waited on briefly, then aborted") {
    val (t1, txn) = (freshDir(), freshDir())
    Snapshots.commit(frame(0 until 6, "seed"), t1)
    val marker = new org.apache.hadoop.fs.Path(txn, "g.final").toString
    Snapshots.commit(frame(100 until 104, "inflight"), t1, "append",
      pending = Some(marker))
    val s = spark
    import s.implicits._
    spark.conf.set("graft.txn.feedGraceMs", "100")
    try {
      var applied = List.empty[(Long, Long, Long)]
      val t0 = System.currentTimeMillis()
      Snapshots.changeFeedBatches(t1) { (df, from, to) =>
        applied ::= ((df.count(), from, to))
      }(Seq(0L, 1L).toDF("version"), 0L)
      assert(System.currentTimeMillis() - t0 >= 100) // grace was granted
      // the txn never decided inside the grace: force-aborted, slice
      // carries only the live seed
      assert(applied === List((6L, -1L, 0L)))
      intercept[IllegalArgumentException] {
        Snapshots.readVersion(spark, t1, Some(1L)).count()
      }
    } finally spark.conf.unset("graft.txn.feedGraceMs")
  }

  test("writers on every mutation path resolve past a torn head") {
    val (t1, txn) = (freshDir(), freshDir())
    val s = spark
    import s.implicits._
    Snapshots.commit(frame(0 until 10, "seed"), t1)
    val marker = new org.apache.hadoop.fs.Path(txn, "dead3.final").toString
    Snapshots.commit(frame(100 until 105, "torn"), t1, "append",
      pending = Some(marker))
    // merge-on-read builds on the LIVE base, not the corpse
    val changes = Seq((0L, "updated", "U"), (999L, "new", "I"))
      .toDF("id", "tag", "op")
    Snapshots.mergeOnRead(spark, t1, changes, "id")
    val m = Snapshots.readManifest(spark, t1, 2L)
    assert(m.pendingMarker.isEmpty)
    val got = Snapshots.readVersion(spark, t1)
    assert(got.count() === 11L) // 10 seeded + 1 insert, torn 5 absent
    assert(got.filter(col("id") === 0L).select("tag").head.getString(0) === "updated")
    // restore refuses the dead version as a target
    intercept[IllegalArgumentException] { Snapshots.restore(spark, t1, 1L) }
    // versionAsOf never resolves to the corpse: even a timestamp far in
    // the future lands on the last LIVE version
    val v = Snapshots.versionAsOf(spark, t1, System.currentTimeMillis() + 60000)
    assert(v === 2L)
  }
}
