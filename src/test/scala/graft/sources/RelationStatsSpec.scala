package graft.sources

import graft.{SparkSpec, TempDirs}
import org.apache.spark.sql.functions._

/** Plan-time statistics from the manifest's per-file byte ledger:
  * a graft relation reports its EXACT on-disk size (zero filesystem
  * calls at plan time), so Catalyst auto-broadcasts a small graft
  * dimension in a join with no hints — the decision that matters most
  * at cluster scale, where the alternative is shuffling both sides.
  */
class RelationStatsSpec extends SparkSpec {

  private def table(dir: String) =
    spark.read.format("graft").load(dir)

  test("manifest byte ledger drives sizeInBytes; small dim auto-broadcasts") {
    val s = spark
    import s.implicits._
    val dimDir = TempDirs.create("stats-dim")
    val factDir = TempDirs.create("stats-fact")
    Snapshots.commit(
      (0L until 50L).map(k => (k, s"name-$k")).toDF("k", "name"), dimDir, "overwrite")
    Snapshots.commit(
      (0L until 20000L).map(i => (i % 50L, i, s"payload-$i")).toDF("k", "i", "p"),
      factDir, "overwrite")

    // stats: the optimized plan's sizeInBytes is the ledger sum, not
    // the session default (which would be effectively infinite)
    val dimStats = table(dimDir).queryExecution.optimizedPlan.stats.sizeInBytes
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Long =
      f.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) st.getLen
        else 0L
      }.sum
    val onDisk = walk(new org.apache.hadoop.fs.Path(dimDir, "data"))
    assert(dimStats.toLong === onDisk, "sizeInBytes must equal live file bytes")

    // planning: the 50-row dim broadcasts with NO hint
    val joined = table(factDir).join(table(dimDir), "k")
      .groupBy("name").agg(sum("i").as("si"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft dim must auto-broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
    assert(joined.count() === 50L)
  }

  test("appends, DML, and compaction keep the byte ledger complete") {
    val s = spark
    import s.implicits._
    val dir = TempDirs.create("stats-ledger")
    Snapshots.commit((0L until 100L).map(k => (k, k * 2)).toDF("k", "v"),
      dir, "overwrite", statsColumns = Seq("k"))
    Snapshots.commit((100L until 200L).map(k => (k, k * 2)).toDF("k", "v"),
      dir, "append", statsColumns = Seq("k"))
    // merge-on-read upsert (adds payload files) and an UPDATE rewrite
    Snapshots.mergeOnRead(spark,
      dir, Seq((5L, 1L, "U")).toDF("k", "v", "op"), "k")
    Snapshots.updateWhere(spark, dir, col("k") === 6L, Map("v" -> lit(0L)))
    Snapshots.compactSmall(spark, dir, minBytes = Long.MaxValue)
    val m = Snapshots.liveManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(m.files.nonEmpty)
    assert(m.files.forall(m.fileBytes.contains),
      s"every live file needs bytes: ${m.files.filterNot(m.fileBytes.contains)}")
    assert(m.fileBytes.values.forall(_ > 0L))
    // DESCRIBE HISTORY surfaces the ledger sum as n_bytes
    val h = Snapshots.history(spark, dir)
      .orderBy(col("version").desc).head()
    assert(h.getAs[Long]("n_bytes") ===
      m.files.iterator.map(m.fileBytes).sum)
  }

  test("the ledger row count reaches Catalyst statistics (CBO-visible)") {
    val s = spark
    import s.implicits._
    val dir = TempDirs.create("stats-rowcount")
    Snapshots.commit((0L until 123L).map(k => (k, k)).toDF("k", "v"),
      dir, "overwrite")
    Snapshots.deleteWhere(spark, dir, col("k") < 3L) // net 120 visible
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = table(dir).queryExecution.optimizedPlan.stats
      assert(stats.rowCount === Some(BigInt(120)),
        s"ledger row count must surface in plan statistics, got $stats")
      assert(stats.sizeInBytes > 0 &&
        stats.sizeInBytes < BigInt(Long.MaxValue) / 4)
    } finally spark.conf.unset("spark.sql.cbo.enabled")
    // without CBO the byte figure still serves (broadcast calculus)
    val plain = table(dir).queryExecution.optimizedPlan.stats
    assert(plain.sizeInBytes < BigInt(Long.MaxValue) / 4)
  }

  test("a pre-byte-accounting manifest parses and falls back to the default") {
    val s = spark
    import s.implicits._
    val dir = TempDirs.create("stats-legacy")
    Snapshots.commit((0L until 10L).map(k => (k, k)).toDF("k", "v"),
      dir, "overwrite")
    // strip the bytes field from the frow= lines, as metadata written
    // before byte accounting would have recorded them. Per-file lines
    // live in the manifest's SEGMENT; segments are immutable (the
    // process-wide cache keys on the path), so the munged copy gets a
    // NEW name and the manifest is re-pointed at it.
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def slurp(p: org.apache.hadoop.fs.Path): String = {
      val in = scala.io.Source.fromInputStream(f.open(p), "UTF-8")
      try in.mkString finally in.close()
    }
    def spit(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val out = f.create(p, false)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    val mPath = f.listStatus(new org.apache.hadoop.fs.Path(dir, "_manifests"))
      .map(_.getPath).find(_.getName.endsWith(".manifest")).get
    val text = slurp(mPath)
    val segRel = text.linesIterator.find(_.startsWith("segment="))
      .get.stripPrefix("segment=").split('\t').head
    val legacySeg = slurp(new org.apache.hadoop.fs.Path(dir, segRel))
      .linesIterator.map { line =>
        if (line.startsWith("frow=")) line.split('\t').head // rows only
        else line
      }.mkString("\n") + "\n"
    val legacyRel = segRel + "-legacy"
    spit(new org.apache.hadoop.fs.Path(dir, legacyRel), legacySeg)
    f.delete(mPath, false)
    spit(mPath, text.replace(segRel, legacyRel))

    val m = Snapshots.readManifest(spark, dir, 0L)
    assert(m.fileRows.nonEmpty && m.fileBytes.isEmpty)
    // relation still serves, with the conservative session default
    // (effectively infinite — never an accidental broadcast)
    val df = table(dir)
    assert(df.count() === 10L)
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(Long.MaxValue) / 4)
  }
}
