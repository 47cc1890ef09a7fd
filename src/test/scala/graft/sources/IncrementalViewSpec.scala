package graft.sources

import graft.SparkSpec
import graft.sources.IncrementalViews.ViewDef
import org.apache.spark.sql.functions._

/** Materialized incremental views ([[IncrementalViews]]): the view
  * must equal the direct aggregate of the source's latest snapshot
  * after every refresh, across the full change vocabulary (append,
  * DV delete, merge-on-read), with replayed refreshes no-oping and
  * rewrites either refused or explicitly re-bootstrapped.
  */
class IncrementalViewSpec extends SparkSpec {

  private val vd = ViewDef(Seq("cat"), Seq(("v", "total")))

  private def frame(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"c${i % 3}", i / 100.0)).toDF("id", "cat", "v")
  }

  /** (cat, n_rows, total) rows of a frame, via the same aggregate the
    * bootstrap uses — the direct-recompute oracle.
    */
  private def expect(df: org.apache.spark.sql.DataFrame) =
    IncrementalViews.aggregate(df, vd)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet

  private def served(viewDir: String) =
    Snapshots.readVersion(spark, viewDir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString)).toSet

  test("view equals direct aggregate across append, delete, and merge; replay no-ops") {
    val src = graft.TempDirs.create("graft-ivspec-src")
    val view = graft.TempDirs.create("graft-ivspec-view")
    Snapshots.commit(frame(0 until 900), src, "overwrite")
    assert(IncrementalViews.bootstrap(spark, src, view, vd) === 0L)
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))
    assert(IncrementalViews.refreshedVersion(spark, view) === 0L)

    Snapshots.commit(frame(1000 until 1200), src, "append")
    IncrementalViews.refresh(spark, src, view, vd)
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))

    // DV delete of an ENTIRE group: it must net to zero and vanish
    Snapshots.deleteWhere(spark, src, col("cat") === "c0")
    IncrementalViews.refresh(spark, src, view, vd)
    assert(!served(view).exists(_._1 == "c0"))
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))

    // merge-on-read with all three ops: the feed presents U as D+I
    val visible = Snapshots.readVersion(spark, src)
    val changes = visible.filter(col("id") % 7 === 0)
      .withColumn("v", col("v") + lit(1.5)).withColumn("op", lit("U"))
      .unionByName(visible.filter(col("id") % 11 === 0)
        .withColumn("id", col("id") + lit(5000L)).withColumn("op", lit("I")))
      .unionByName(visible.filter(col("id") % 13 === 0)
        .withColumn("op", lit("D")))
    Snapshots.mergeOnRead(spark, src, changes, "id")
    val v3 = IncrementalViews.refresh(spark, src, view, vd)
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))

    // replayed refresh: nothing new → same view version, no commit
    assert(IncrementalViews.refresh(spark, src, view, vd) === v3)
    assert(Snapshots.latestVersion(spark, view).get === v3)
    assert(IncrementalViews.refreshedVersion(spark, view)
      === Snapshots.latestVersion(spark, src).get)
  }

  test("viewSink: streamed maintenance == direct aggregate; restart no-ops") {
    val src = graft.TempDirs.create("graft-ivspec-st-src")
    val view = graft.TempDirs.create("graft-ivspec-st-view")
    val ckpt = graft.TempDirs.create("graft-ivspec-st-ckpt")
    Snapshots.commit(frame(0 until 600), src, "overwrite")
    def query() = Snapshots.streamChangeFeed(spark, src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(IncrementalViews.viewSink(src, view, vd) _)
      .start()
    val q1 = query()
    try {
      q1.processAllAvailable() // first batch bootstraps the view
      assert(served(view) === expect(Snapshots.readVersion(spark, src)))
      Snapshots.commit(frame(700 until 800), src, "append")
      Snapshots.deleteWhere(spark, src, col("id") % 5 === 0)
      q1.processAllAvailable()
      assert(served(view) === expect(Snapshots.readVersion(spark, src)))
    } finally q1.stop()
    val vBefore = Snapshots.latestVersion(spark, view).get
    // restart from the checkpoint: nothing new → no view commit
    val q2 = query()
    try q2.processAllAvailable() finally q2.stop()
    assert(Snapshots.latestVersion(spark, view).get === vBefore)
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))
  }

  test("min/max view: append-only folds exactly; a deleting slice refuses or rebootstraps") {
    val vdx = IncrementalViews.ViewDef(Seq("cat"), Seq(("v", "total")),
      maxs = Seq(("v", "v_max")), mins = Seq(("v", "v_min")))
    def both(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDouble(3), r.getDouble(4))).toSet
    val src = graft.TempDirs.create("graft-ivspec-mm-src")
    val view = graft.TempDirs.create("graft-ivspec-mm-view")
    Snapshots.commit(frame(100 until 400), src, "overwrite")
    IncrementalViews.bootstrap(spark, src, view, vdx)
    Snapshots.commit(frame(1000 until 1100), src, "append") // new maxima
    Snapshots.commit(frame(0 until 50), src, "append")      // new minima
    IncrementalViews.refresh(spark, src, view, vdx)
    assert(both(Snapshots.readVersion(spark, view)) ===
      both(IncrementalViews.aggregate(Snapshots.readVersion(spark, src), vdx)))
    // a delete arrives: the extremum may have departed — refuse...
    Snapshots.deleteWhere(spark, src, col("id") >= 1000L)
    intercept[IllegalArgumentException] {
      IncrementalViews.refresh(spark, src, view, vdx)
    }
    // ...or explicitly recompute
    IncrementalViews.refresh(spark, src, view, vdx, rebootstrapOnRewrite = true)
    assert(both(Snapshots.readVersion(spark, view)) ===
      both(IncrementalViews.aggregate(Snapshots.readVersion(spark, src), vdx)))
  }

  test("rewrite in range: refresh refused; rebootstrapOnRewrite recovers") {
    val src = graft.TempDirs.create("graft-ivspec-rw-src")
    val view = graft.TempDirs.create("graft-ivspec-rw-view")
    Snapshots.commit(frame(0 until 300).repartition(4), src, "overwrite")
    IncrementalViews.bootstrap(spark, src, view, vd)
    Snapshots.commit(frame(400 until 500), src, "append")
    Snapshots.compact(spark, src, numFiles = 1) // rewrite: feed breaks
    intercept[IllegalArgumentException] {
      IncrementalViews.refresh(spark, src, view, vd)
    }
    IncrementalViews.refresh(spark, src, view, vd, rebootstrapOnRewrite = true)
    assert(served(view) === expect(Snapshots.readVersion(spark, src)))
    assert(IncrementalViews.refreshedVersion(spark, view)
      === Snapshots.latestVersion(spark, src).get)
  }
}
