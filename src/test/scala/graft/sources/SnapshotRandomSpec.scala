package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import scala.util.Random

/** Randomized (fixed-seed) protocol check: random sequences of
  * commit/append/compact/deleteWhere/updateWhere/mergeOnRead/restore/
  * purgeDeletes/vacuum — plus CRASHED and COMMITTED transactions and
  * bucketed re-clustering — against a driver-side reference model of
  * what every version must contain. The snapshot contract holds on
  * interleavings no hand-written fixture thought of (e.g.
  * delete-then-compact, crashed-txn-then-merge, purge-then-vacuum,
  * clone-at-masked-version). Model states: Live(rows) = serves exactly
  * those rows; Dead = a txn version that aborted or never decided
  * (manifest recorded, number burned, every read refuses); Gone =
  * vacuumed (manifest expired).
  */
class SnapshotRandomSpec extends SparkSpec {

  import spark.implicits._

  private sealed trait St
  private case class Live(rows: Set[(Long, String)]) extends St
  private case object Dead extends St
  private case object Gone extends St

  test("random op sequences: every live version serves exactly its model rows") {
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new Random(seed)
      val dir = graft.TempDirs.create(s"graft-snap-rand-$seed")
      val txnDir = graft.TempDirs.create(s"graft-snap-rand-txn-$seed")
      var nextId = 0L
      var nextTxn = 0
      def batch(): (Set[(Long, String)], org.apache.spark.sql.DataFrame) = {
        val n = 1 + rnd.nextInt(20)
        val tag = s"t${rnd.nextInt(1000)}"
        val rows = (0 until n).map { _ => nextId += 1; (nextId, tag) }.toSet
        (rows, rows.toSeq.toDF("id", "tag"))
      }
      var model = Vector.empty[St]
      def lastLive: Set[(Long, String)] =
        model.reverseIterator.collectFirst { case Live(r) => r }.get
      val (r0, df0) = batch()
      Snapshots.commit(df0, dir, "overwrite")
      model :+= Live(r0)
      var floor = 0L

      // a materialized view rides the whole random walk: periodic
      // refreshes (rebootstrap on rewrites/vacuumed watermarks) must
      // always land exactly on the model's aggregate of the live rows
      val viewDir = graft.TempDirs.create(s"graft-snap-rand-view-$seed")
      val vdef = IncrementalViews.ViewDef(Seq("tag"), Seq(("id", "id_sum")))
      IncrementalViews.bootstrap(spark, dir, viewDir, vdef)
      def checkView(at: String): Unit = {
        val got = Snapshots.readVersion(spark, viewDir)
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getDecimal(2).longValueExact())).toSet
        val want = lastLive.groupBy(_._2).map { case (tag, rs) =>
          (tag, rs.size.toLong, rs.toSeq.map(_._1).sum) }.toSet
        assert(got === want, s"seed=$seed view $at")
      }
      checkView("bootstrap")

      var step = 0
      for (_ <- 1 to 18) {
        step += 1
        if (step % 5 == 0) {
          IncrementalViews.refresh(spark, dir, viewDir, vdef,
            rebootstrapOnRewrite = true)
          checkView(s"step $step")
        }
        rnd.nextInt(20) match {
          case i if i < 4 => // append (sometimes bloom-indexed: the
            // index must ride every later protocol op unharmed)
            val (rows, df) = batch()
            val blooms = if (rnd.nextBoolean()) Seq("id") else Nil
            Snapshots.commit(df, dir, "append", bloomColumns = blooms)
            model :+= Live(lastLive ++ rows)
          case i if i < 6 => // overwrite (copy-on-write rewrite)
            val (rows, df) = batch()
            Snapshots.commit(df, dir, "overwrite")
            model :+= Live(rows)
          case i if i < 8 => // compact: same rows (masks applied), new version
            Snapshots.compact(spark, dir, numFiles = 1 + rnd.nextInt(3))
            model :+= Live(lastLive)
          case i if i < 10 => // DV delete of a random residue class —
            // a no-match delete must consume NO version
            val m = 2 + rnd.nextInt(4)
            val r = rnd.nextInt(m)
            val cur = lastLive
            val keep = cur.filterNot(_._1 % m == r)
            Snapshots.deleteWhere(spark, dir, col("id") % m === r.toLong)
            if (keep.size < cur.size) model :+= Live(keep)
          case 10 => // purge: physical rewrite of the masked snapshot
            Snapshots.purgeDeletes(spark, dir)
            model :+= Live(lastLive)
          case 11 if rnd.nextBoolean() => // UPDATE via mask+re-append:
            // retag a random residue class (no-match must not commit)
            val m = 2 + rnd.nextInt(4)
            val r = rnd.nextInt(m)
            val utag = s"w${rnd.nextInt(1000)}"
            val cur = lastLive
            val hit = cur.exists(_._1 % m == r)
            Snapshots.updateWhere(spark, dir, col("id") % m === r.toLong,
              Map("tag" -> org.apache.spark.sql.functions.lit(utag)))
            if (hit) model :+= Live(cur.map { case (id, t) =>
              (id, if (id % m == r) utag else t) })
          case 11 => // merge-on-read: random CDC batch (D/U/I mix)
            val cur = lastLive
            val ids = cur.map(_._1).toSeq.sorted
            val dels = ids.filter(_ => rnd.nextInt(8) == 0).toSet
            val upds = ids.filterNot(dels).filter(_ => rnd.nextInt(8) == 0).toSet
            val ins = (1 to rnd.nextInt(4))
              .map { _ => nextId += 1; (nextId, s"i${rnd.nextInt(1000)}") }
            val utag = s"u${rnd.nextInt(1000)}"
            val batch =
              dels.toSeq.map(id => (id, "", "D")) ++
                upds.toSeq.map(id => (id, utag, "U")) ++
                ins.map { case (id, t) => (id, t, "I") }
            if (batch.nonEmpty) {
              Snapshots.mergeOnRead(spark, dir,
                batch.toDF("id", "tag", "op"), "id")
              model :+= Live(
                cur.filterNot(r => dels(r._1) || upds(r._1)) ++
                  upds.map(id => (id, utag)) ++ ins)
            }
          case 12 => // restore to a random LIVE version (rollback)
            val liveNow = model.zipWithIndex.collect { case (Live(_), v) => v }
            val tgt = liveNow(rnd.nextInt(liveNow.size))
            Snapshots.restore(spark, dir, tgt.toLong)
            model :+= model(tgt)
          case 13 => // CRASHED txn: pending manifest, decision never
            // published — the version number burns, the data must
            // never surface, and every later op resolves past it
            val (_, df) = batch()
            nextTxn += 1
            val marker = new org.apache.hadoop.fs.Path(
              txnDir, s"crash-$nextTxn.final").toString
            val mode = if (rnd.nextBoolean()) "append" else "overwrite"
            Snapshots.commit(df, dir, mode, pending = Some(marker))
            model :+= Dead
          case 14 => // COMMITTED txn: the two-phase path must land
            // exactly like a plain append
            val (rows, df) = batch()
            Snapshots.commitTxn(Seq((df, dir, "append")), txnDir)
            model :+= Live(lastLive ++ rows)
          case 15 => // bucketed re-cluster: same rows, hash-clustered
            Snapshots.compactBucketed(spark, dir, "id", 2 + rnd.nextInt(6))
            model :+= Live(lastLive)
          case 16 => // partial compaction: every file is "small" at
            // this scale, so masks consolidate through the rewrite —
            // same rows, exact ledger, and a no-op when <2 files
            val before = Snapshots.latestVersion(spark, dir).get
            val v = Snapshots.compactSmall(spark, dir, minBytes = 1L << 40)
            if (v > before) model :+= Live(lastLive)
          case 17 => // unique append: fresh keys land, a batch reusing
            // ANY live key is refused and consumes no version
            val cur = lastLive
            if (rnd.nextBoolean() && cur.nonEmpty) {
              val clash = cur.map(_._1).toSeq.sorted.apply(
                rnd.nextInt(cur.size))
              val dupDf = Seq((clash, "dup")).toDF("id", "tag")
              intercept[IllegalArgumentException] {
                Snapshots.commitUnique(dupDf, dir, "id")
              } // model unchanged
            } else {
              val (rows, df) = batch()
              Snapshots.commitUnique(df, dir, "id")
              model :+= Live(cur ++ rows)
            }
          case _ => // vacuum to a random floor ≤ the LAST LIVE version
            // (expiring every live version while a dead txn head
            // survives would leave the table unreadable — a legal but
            // degenerate state this model deliberately avoids)
            val lastLiveV = model.lastIndexWhere(_.isInstanceOf[Live]).toLong
            val keep = floor + rnd.nextInt((lastLiveV - floor + 1).toInt)
            if (keep > floor) {
              Snapshots.vacuum(spark, dir, keep)
              model = model.zipWithIndex.map { case (m, v) =>
                if (v < keep) Gone else m
              }
              floor = keep
            }
        }
      }

      // final view refresh after whatever the walk left at the head
      IncrementalViews.refresh(spark, dir, viewDir, vdef,
        rebootstrapOnRewrite = true)
      checkView("final")

      // clone the table at a random LIVE version mid-history, then
      // push both tables forward independently — the clone must pin
      // its fork point and neither table may see the other's writes
      val liveVs = model.zipWithIndex.collect { case (Live(_), v) => v }
      val forkV = liveVs(rnd.nextInt(liveVs.size)).toLong
      val cloneDir = graft.TempDirs.create(s"graft-snap-rand-clone-$seed")
      Snapshots.cloneShallow(spark, dir, cloneDir, Some(forkV))
      val forkRows = model(forkV.toInt).asInstanceOf[Live].rows
      val (extraRows, extraDf) = batch()
      Snapshots.commit(extraDf, cloneDir, "append")
      def rowsAt(d: String, v: Long): Set[(Long, String)] =
        Snapshots.readVersion(spark, d, Some(v))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rowsAt(cloneDir, 0L) === forkRows, s"seed=$seed clone v0")
      assert(rowsAt(cloneDir, 1L) === forkRows ++ extraRows,
        s"seed=$seed clone v1")
      assert(rowsAt(dir, model.size - 1L) === lastLive,
        s"seed=$seed source after clone write")

      assert(Snapshots.latestVersion(spark, dir) === Some(model.size - 1L))
      assert(Snapshots.vacuumFloor(spark, dir) === floor)
      // the default read resolves to the last LIVE version even when
      // dead txn versions sit at or near the head
      assert(Snapshots.readVersion(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet === lastLive,
        s"seed=$seed latest-live resolution")
      // point lookups through whatever index history the random walk
      // left behind (bloomed appends, bucketed re-clusters, rewrites,
      // masks) answer exactly: sampled present ids + one absent id
      val finalRows = lastLive.toMap
      val sample = finalRows.keys.toSeq.sorted.take(5)
      sample.foreach { id =>
        val got = Snapshots.readVersionKeys(spark, dir, "id", Seq(id))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(got.toSeq === Seq(id -> finalRows(id)),
          s"seed=$seed lookup id=$id")
      }
      assert(Snapshots.readVersionKeys(spark, dir, "id",
        Seq(nextId + 999999L)).count() === 0L, s"seed=$seed absent lookup")
      model.zipWithIndex.foreach {
        case (Live(rows), v) =>
          val got = Snapshots.readVersion(spark, dir, Some(v.toLong))
            .collect().map(r => (r.getLong(0), r.getString(1))).toSet
          assert(got === rows, s"seed=$seed version=$v")
          // manifest row accounting is EXACT on every interleaving:
          // visible rows == dataRows − dvRows (masks only ever target
          // currently-visible rows, so the ledger can never drift)
          val m = Snapshots.readManifest(spark, dir, v.toLong)
          assert(m.dataRows >= 0 && m.dvRows >= 0,
            s"seed=$seed version=$v accounting unknown")
          assert(m.dataRows - m.dvRows === rows.size.toLong,
            s"seed=$seed version=$v accounting ${m.dataRows}-${m.dvRows}")
        case (Dead, v) =>
          // the manifest is recorded history (number burned)...
          val m = Snapshots.readManifest(spark, dir, v.toLong)
          assert(m.pendingMarker.nonEmpty, s"seed=$seed dead v=$v marker")
          // ...but no read path serves it
          intercept[IllegalArgumentException] {
            Snapshots.readVersion(spark, dir, Some(v.toLong)).count()
          }
        case (Gone, v) =>
          intercept[IllegalArgumentException] {
            Snapshots.readManifest(spark, dir, v.toLong)
          }
          // an expired version can never be re-committed
          intercept[java.util.ConcurrentModificationException] {
            Snapshots.commit(Seq((0L, "x")).toDF("id", "tag"), dir,
              "overwrite", expectedVersion = Some(v.toLong))
          }
      }
    }
  }
}
