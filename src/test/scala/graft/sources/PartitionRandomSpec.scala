package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}
import scala.util.Random

/** Randomized (fixed-seed) protocol check for the PARTITIONED layer:
  * random interleavings of partitioned appends, flat-tail appends,
  * predicate deletes/updates (partition-scoped, key-scoped, mixed),
  * purge rewrites and partial compactions — each step checked against
  * a driver-side relational model on four axes at once:
  *
  *   1. full read == model rows (the layout is result-invisible);
  *   2. a partition-filtered read == the model's slice AND its
  *      surviving file list stays inside matching dirs + the flat
  *      tail (pruning is real, never wrong);
  *   3. grouped metadata COUNT(*) == the model's group sizes whenever
  *      the rewrite fires, and the scan path agrees whenever it
  *      cannot (DV masks present);
  *   4. DML mask scans pruned by the predicate produce exactly the
  *      model's surviving rows (the conservative-pruning contract
  *      under every predicate shape the generator emits).
  */
class PartitionRandomSpec extends SparkSpec {

  import spark.implicits._

  private val parts = Seq("red", "green", "blue")

  test("random partitioned op sequences match the relational model") {
    for (seed <- Seq(11, 47)) {
      val rnd = new Random(seed)
      val dir = graft.TempDirs.create(s"graft-part-rand-$seed")
      var nextId = 0L
      def batch(partitioned: Boolean): (Set[(Long, String, Long)],
          org.apache.spark.sql.DataFrame) = {
        val n = 1 + rnd.nextInt(15)
        val rows = (0 until n).map { _ =>
          nextId += 1
          (nextId, parts(rnd.nextInt(parts.size)), rnd.nextInt(100).toLong)
        }.toSet
        (rows, rows.toSeq.toDF("id", "p", "v"))
      }
      // seed: partitioned overwrite
      val (r0, df0) = batch(partitioned = true)
      Snapshots.commit(df0, dir, "overwrite", partitionBy = Seq("p"),
        statsColumns = Seq("id"))
      var model: Set[(Long, String, Long)] = r0

      def check(step: Int): Unit = {
        val got = Snapshots.readVersion(spark, dir)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(got === model, s"seed=$seed step=$step full read diverged")
        // partition-filtered read: content + file discipline
        val want = parts(rnd.nextInt(parts.size))
        val pruned = Snapshots.readVersionFiltered(spark, dir, None,
          Seq(org.apache.spark.sql.sources.EqualTo("p", want)))
        val sliceGot = pruned.where(col("p") === want)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(sliceGot === model.filter(_._2 == want),
          s"seed=$seed step=$step partition slice diverged")
        assert(pruned.inputFiles.forall(f =>
          f.contains(s"p=$want") || !f.contains("p=")),
          s"seed=$seed step=$step pruned scan left the wanted dir + flat tail")
        // grouped metadata count vs model (fires or not, must agree)
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW part_rand " +
          s"USING graft OPTIONS (path '$dir')")
        val grouped = spark.sql(
          "SELECT p, COUNT(*) AS n FROM part_rand GROUP BY p")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val wantGroups = model.groupBy(_._2).map { case (k, rs) =>
          k -> rs.size.toLong }
        assert(grouped === wantGroups,
          s"seed=$seed step=$step grouped count diverged")
      }
      check(0)

      for (step <- 1 to 14) {
        rnd.nextInt(6) match {
          case 0 => // partitioned append
            val (r, df) = batch(partitioned = true)
            Snapshots.commit(df, dir, "append", partitionBy = Seq("p"),
              statsColumns = Seq("id"))
            model ++= r
          case 1 => // flat-tail append (no partition dirs, still exact)
            val (r, df) = batch(partitioned = false)
            Snapshots.commit(df, dir, "append", statsColumns = Seq("id"))
            model ++= r
          case 2 => // partition-scoped DELETE (mask scan pruned)
            val p = parts(rnd.nextInt(parts.size))
            Snapshots.deleteWhere(spark, dir, col("p") === p)
            model = model.filterNot(_._2 == p)
          case 3 => // key-range UPDATE (stat-pruned mask scan)
            val lo = rnd.nextLong(math.max(1L, nextId))
            Snapshots.updateWhere(spark, dir,
              col("id") >= lo && col("p") =!= parts(0),
              Map("v" -> (col("v") + lit(1000L))))
            model = model.map { case (id, p, v) =>
              if (id >= lo && p != parts(0)) (id, p, v + 1000L) else (id, p, v)
            }
          case 4 => // purge rewrite: mask gone, layout preserved
            Snapshots.purgeDeletes(spark, dir)
            val m = Snapshots.readManifest(spark, dir,
              Snapshots.latestVersion(spark, dir).get)
            assert(m.partitionCols === Seq("p"),
              s"seed=$seed step=$step purge dropped the partition spec")
            assert(m.dvs.isEmpty)
          case 5 => // partial compaction of the small tail
            Snapshots.compactSmall(spark, dir, minBytes = 1L << 16)
        }
        check(step)
      }
    }
  }
}
