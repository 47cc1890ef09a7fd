package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-versioned Parquet: commit/read-at-version semantics,
  * snapshot isolation across a rewrite, and the atomic-rename
  * concurrent-commit guard.
  */
class SnapshotSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-snap-spec").toString

  private def frame(ids: Range, tag: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("commit assigns sequential versions; read-at-version is exact") {
    val dir = freshDir()
    assert(Snapshots.latestVersion(spark, dir).isEmpty)
    assert(Snapshots.commit(frame(0 until 10, "a"), dir) === 0L)
    assert(Snapshots.commit(frame(10 until 15, "b"), dir, "append") === 1L)
    assert(Snapshots.commit(frame(0 until 3, "c"), dir, "overwrite") === 2L)
    assert(Snapshots.latestVersion(spark, dir) === Some(2L))
    assert(Snapshots.readVersion(spark, dir, Some(0L)).count() === 10L)
    assert(Snapshots.readVersion(spark, dir, Some(1L)).count() === 15L)
    assert(Snapshots.readVersion(spark, dir, Some(2L)).count() === 3L)
    // default read = latest
    assert(Snapshots.readVersion(spark, dir).count() === 3L)
    // append carried v0's rows by reference, plus the new batch
    val v1Tags = Snapshots.readVersion(spark, dir, Some(1L))
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v1Tags === Map("a" -> 10L, "b" -> 5L))
  }

  test("snapshot isolation: old versions survive a later rewrite untouched") {
    val dir = freshDir()
    Snapshots.commit(frame(0 until 100, "base"), dir)
    val v0Before = Snapshots.readVersion(spark, dir, Some(0L))
      .agg(sum("id")).head.getLong(0)
    Snapshots.commit(frame(0 until 1, "rewrite"), dir, "overwrite")
    val v0After = Snapshots.readVersion(spark, dir, Some(0L))
      .agg(sum("id")).head.getLong(0)
    assert(v0Before === v0After)
    assert(Snapshots.readVersion(spark, dir, Some(1L)).count() === 1L)
  }

  test("concurrent commit of the same version: one winner, loser throws and cleans up") {
    val dir = freshDir()
    Snapshots.commit(frame(0 until 5, "v0"), dir)
    // two writers both read latest=0 and race to commit version 1;
    // expectedVersion pins each writer's claim (the CAS protocol)
    Snapshots.commit(frame(0 until 7, "winner"), dir, "overwrite",
      expectedVersion = Some(1L))
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commit(frame(0 until 2, "loser"), dir, "overwrite",
        expectedVersion = Some(1L))
    }
    // the winner's snapshot is what version 1 serves
    assert(Snapshots.readVersion(spark, dir, Some(1L)).count() === 7L)
    // the loser's orphaned data dir was removed: every data dir on
    // disk is referenced by some manifest
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = (0L to 1L)
      .flatMap(v => Snapshots.readManifest(spark, dir, v).files)
      .map(_.split("/")(1)).toSet
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "data"))
      .map(_.getPath.getName).toSet
    assert(onDisk === referenced)
  }

  test("u3 demo: per-version aggregates over the sf0.001 orders") {
    val rows = Snapshots.u3TimeTravel(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    val (n0, n1, n2) = (rows(0).getLong(1), rows(1).getLong(1), rows(2).getLong(1))
    assert(n1 > n0)  // append added rows
    assert(n2 < n1)  // rewrite dropped the F rows
  }
}
