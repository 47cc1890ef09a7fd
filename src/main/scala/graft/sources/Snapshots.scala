package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.collection.mutable.ArrayBuffer

/** Manifest-versioned Parquet — snapshot isolation and time travel
  * over a plain Parquet directory, without a table-format dependency.
  * This is the table-format layer's core contract re-expressed with
  * two primitives every Hadoop-compatible filesystem has: immutable
  * data files and an atomic create-if-absent (rename) for the commit
  * point.
  *
  * Layout under `tableDir`:
  * {{{
  *   data/v<N>-<uuid>/part-*.parquet   immutable per-commit data files
  *   _manifests/v<N>.manifest          the commit point: file list of version N
  * }}}
  *
  * A reader at version N opens `v<N>.manifest` and reads EXACTLY the
  * files it lists — concurrent commits never disturb it (new commits
  * only add new data dirs and a new manifest; nothing is mutated or
  * deleted), which is snapshot isolation. The manifest is created by
  * writing to a temp name and `rename`ing to `v<N>.manifest`: on
  * HDFS/local/object-store committers the rename FAILS if the target
  * exists, so two writers racing to commit version N resolve to one
  * winner and one `ConcurrentModificationException` — optimistic
  * concurrency, the same protocol the format engines use on their log.
  *
  * Scale shape: a commit's driver-side cost is one directory listing
  * of the files it just wrote plus one small manifest write —
  * O(files in the commit), independent of table size; `append` carries
  * the previous manifest's (relative) file paths forward by reference,
  * no data is rewritten. Reads hand Spark an explicit file list, so
  * partition pruning and row-group pushdown work unchanged.
  */
object Snapshots {

  private val Header = "graft-manifest-v1"

  final case class Manifest(version: Long, files: Seq[String])

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(tableDir: String, v: Long): Path =
    new Path(tableDir, f"_manifests/v$v%06d.manifest")

  /** Latest committed version, or None for an uninitialized table.
    * One listing of the (small) manifest dir.
    */
  def latestVersion(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val dir = new Path(tableDir, "_manifests")
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Commit `df` as the next version. `mode`:
    *   - "overwrite": version N = exactly the files this commit writes
    *     (full-snapshot semantics — the copy-on-write shape for
    *     updates/deletes, e.g. a [[graft.operators.Merge]] result);
    *   - "append": version N = version N-1's files PLUS this commit's
    *     (late-arriving data; nothing rewritten).
    *
    * Returns the committed version. Throws
    * `ConcurrentModificationException` when another writer committed
    * the same version first; the loser's orphaned data dir is removed
    * before throwing (retry by re-running the commit — the reader-side
    * view is unaffected either way). `expectedVersion` pins the
    * version this writer intends to create (compare-and-swap: a writer
    * that read version N-1 commits N, and fails rather than silently
    * landing on top of someone else's N); default is latest+1 at
    * commit time.
    */
  def commit(df: DataFrame, tableDir: String, mode: String = "overwrite",
             expectedVersion: Option[Long] = None): Long = {
    require(mode == "overwrite" || mode == "append", s"bad mode: $mode")
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val version = expectedVersion.getOrElse(
      latestVersion(spark, tableDir).map(_ + 1).getOrElse(0L))
    val dataRel = f"data/v$version%06d-${UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(tableDir, dataRel)
    df.write.parquet(dataDir.toString)
    val written = f.listStatus(dataDir).iterator.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"$dataRel/$n").toSeq.sorted
    val carried =
      if (mode == "append" && version > 0)
        readManifest(spark, tableDir, version - 1).files
      else Seq.empty
    val tmp = new Path(tableDir, s"_manifests/.tmp-$version-${UUID.randomUUID()}")
    val w = new OutputStreamWriter(f.create(tmp, false), StandardCharsets.UTF_8)
    try {
      w.write(s"$Header\n")
      w.write(s"version=$version\n")
      (carried ++ written).foreach(p => w.write(s"file=$p\n"))
    } finally w.close()
    // THE commit point: atomic rename-if-absent. A concurrent winner
    // already holds v<N>.manifest and rename returns false.
    if (!f.rename(tmp, manifestPath(tableDir, version))) {
      f.delete(tmp, false)
      f.delete(dataDir, true)
      throw new java.util.ConcurrentModificationException(
        s"version $version of $tableDir was committed concurrently")
    }
    version
  }

  /** Parse one manifest (bounded: one small file read on the driver). */
  def readManifest(spark: SparkSession, tableDir: String, version: Long): Manifest = {
    val f = fs(spark, tableDir)
    val p = manifestPath(tableDir, version)
    require(f.exists(p), s"no version $version at $tableDir")
    val r = new BufferedReader(
      new InputStreamReader(f.open(p), StandardCharsets.UTF_8))
    try {
      require(r.readLine() == Header, s"unrecognized manifest format in $p")
      val files = ArrayBuffer.empty[String]
      var line = r.readLine()
      while (line != null) {
        if (line.startsWith("file=")) files += line.stripPrefix("file=")
        line = r.readLine()
      }
      Manifest(version, files.toSeq)
    } finally r.close()
  }

  /** Time travel: the table exactly as of `version` (default latest).
    * An empty version (a committed empty frame) still carries its
    * schema via the parquet footers of zero files — callers commit at
    * least one row or handle the empty list themselves.
    */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, tableDir)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    val abs = m.files.map(rel => new Path(tableDir, rel).toString)
    spark.read.parquet(abs: _*)
  }

  /** The time-travel demo over orders, deterministic so the oracle can
    * replay each version's state relationally:
    *   v0 = initial load (overwrite);
    *   v1 = v0 + a late-arriving batch re-keyed out of range (append —
    *        v0's files are carried by reference, nothing rewritten);
    *   v2 = v1 with 'F' rows dropped (copy-on-write rewrite, the
    *        retention/compaction shape).
    * Output: per-version row count and exact-decimal price total, read
    * BACK THROUGH THE MANIFESTS (v0 and v1 answers must survive the
    * v2 rewrite — that IS the snapshot-isolation assertion). The demo
    * lake lives under a fresh temp dir per invocation; production
    * callers pass a durable tableDir.
    */
  def u3TimeTravel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft-snapshots").toString
    val orders = graft.Tables.orders(s, d)
    commit(orders, tableDir, "overwrite")
    val late = orders.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
    commit(late, tableDir, "append")
    commit(readVersion(s, tableDir, Some(1L))
      .filter(col("o_orderstatus") =!= "F"), tableDir, "overwrite")
    (0L to 2L).map { v =>
      readVersion(s, tableDir, Some(v))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .select(lit(v).as("version"), col("n_rows"), col("total"))
    }.reduce(_ unionByName _).orderBy("version")
  }
}
