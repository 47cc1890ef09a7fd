package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file bloom index: manifest-recorded blooms built at commit,
  * probe-side pruning in readVersionKeys, composition with buckets and
  * stats, and the carry rules (appends/merges/clones keep the index).
  * Scan-side assertions via `DataFrame.inputFiles` — what the u24
  * oracle cannot see.
  */
class BloomIndexSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-bloom-spec")

  private def slice(lo: Int, hi: Int, tag: String) = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "tag").coalesce(1)
  }

  test("ingest-sliced appends: lookups scan only the files whose blooms hit") {
    val dir = freshDir()
    // four ingest batches with disjoint id ranges — ingest locality,
    // but NO stats and NO clustering: blooms are the only pruner
    Snapshots.commit(slice(0, 250, "b0"), dir, "overwrite",
      bloomColumns = Seq("id"))
    Snapshots.commit(slice(250, 500, "b1"), dir, "append",
      bloomColumns = Seq("id"))
    Snapshots.commit(slice(500, 750, "b2"), dir, "append",
      bloomColumns = Seq("id"))
    Snapshots.commit(slice(750, 1000, "b3"), dir, "append",
      bloomColumns = Seq("id"))
    val m = Snapshots.readManifest(spark, dir, 3L)
    assert(m.files.size === 4)
    assert(m.blooms.keySet === m.files.map(f => (f, "id")).toSet)
    // two keys from two different slices: ≤ 2 files scanned (bloom
    // false positives could admit one more — geometry makes that ~1%)
    val two = Snapshots.readVersionKeys(spark, dir, "id", Seq(100L, 800L))
    assert(two.inputFiles.length < 4)
    assert(two.select("id").collect().map(_.getLong(0)).sorted === Array(100L, 800L))
    // a key that exists nowhere: pruning may drop everything, the
    // answer is exact either way
    assert(Snapshots.readVersionKeys(spark, dir, "id", Seq(123456L)).count() === 0L)
    // Int literal probes hash through the cast to the stored bigint
    assert(Snapshots.readVersionKeys(spark, dir, "id", Seq(100)).count() === 1L)
  }

  test("blooms compose with buckets and survive merge and clone") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    val data = (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    Snapshots.commit(data, dir, "overwrite",
      bucketBy = Some(("id", 8)), bloomColumns = Seq("id"))
    val m0 = Snapshots.readManifest(spark, dir, 0L)
    assert(m0.blooms.keySet === m0.files.map(f => (f, "id")).toSet)
    val one = Snapshots.readVersionKeys(spark, dir, "id", Seq(77L))
    assert(one.inputFiles.length <= 1) // bucket ∧ bloom
    assert(one.select("tag").head.getString(0) === "r77")
    // merge-on-read keeps the index on the untouched files
    val changes = Seq((77L, "updated", "U")).toDF("id", "tag", "op")
    Snapshots.mergeOnRead(spark, dir, changes, "id")
    val m1 = Snapshots.readManifest(spark, dir, 1L)
    assert(m1.blooms.nonEmpty)
    assert(Snapshots.readVersionKeys(spark, dir, "id", Seq(77L))
      .select("tag").head.getString(0) === "updated")
    // clone carries the index re-keyed to absolute refs
    val cloneDir = freshDir()
    Snapshots.cloneShallow(spark, dir, cloneDir)
    val cm = Snapshots.readManifest(spark, cloneDir, 0L)
    assert(cm.blooms.size === m1.blooms.size)
    assert(Snapshots.readVersionKeys(spark, cloneDir, "id", Seq(42L)).count() === 1L)
  }

  test("string keys and manifest round-trip preserve the exact bit sets") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    val users = (0 until 300).map(i => (s"user-$i", i)).toDF("name", "score")
      .coalesce(1)
    Snapshots.commit(users, dir, "overwrite", bloomColumns = Seq("name"))
    val m = Snapshots.readManifest(spark, dir, 0L)
    val b = m.blooms((m.files.head, "name"))
    assert(b.mBits === 8192 && b.k === 3 && b.words.length === 128)
    assert(b.words.exists(_ != 0L)) // bits actually set
    // every present key passes its own bloom (zero false negatives):
    // the lookup finds all 300 through the index
    val all = Snapshots.readVersionKeys(spark, dir, "name",
      (0 until 300).map(i => s"user-$i"))
    assert(all.count() === 300L)
    assert(Snapshots.readVersionKeys(spark, dir, "name", Seq("nobody"))
      .count() === 0L)
  }
}
