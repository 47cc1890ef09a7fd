package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Segment-diff maintenance publishes (VERDICT r15 task #1): the thin
  * paths of [[Snapshots.compactSmall]] / [[Snapshots.clusterTail]] /
  * [[Snapshots.purgeDeletes]] must plan candidates through the
  * checkpoint, resolve their base THIN, and publish a manifest DELTA —
  * never consulting a segment the rewrite does not touch. The proof is
  * [[Snapshots.segmentTouchHook]]: it observes every `cachedSegment`
  * call (cache hits included), so "untouched segments untouched" is a
  * recorded fact, not an inference — the driver-side twin of
  * [[CountingLocalFs]]'s getFileStatus ledger proof.
  */
class ThinMaintenanceSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-thinmaint")

  private def frame(ids: Range, tag: String) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  /** Run `body` with the segment-touch hook installed; returns the
    * set of segment rels consulted during it.
    */
  private def recordTouches[T](body: => T): (T, Set[String]) = {
    val touched = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Snapshots.segmentTouchHook.set((rel: String) => { touched.add(rel); () })
    try {
      val r = body
      (r, scala.jdk.CollectionConverters.SetHasAsScala(touched).asScala.toSet)
    } finally Snapshots.segmentTouchHook.set(null)
  }

  /** The segments owning `rels` at `version`, via the same planning
    * walk the thin operators use.
    */
  private def owningSegs(dir: String, version: Long,
                         rels: Set[String]): Set[String] = {
    val all = Snapshots.liveEntriesCheckpointed(spark, dir, version,
      (_: Snapshots.CkptFile) => true)
      .getOrElse(fail("fixture must have a covering checkpoint"))
    all.filter(e => rels.contains(e.file)).map(_.seg).toSet
  }

  test("thin compactSmall: untouched segments never consulted, masks " +
    "consolidated, ledger exact, carried metadata intact") {
    val dir = freshDir()
    // six single-file commits → six segments; three big, three small
    Snapshots.commit(frame(0 until 4000, "b0").coalesce(1), dir,
      "overwrite", statsColumns = Seq("id"))
    Snapshots.commit(frame(4000 until 8000, "b1").coalesce(1), dir,
      "append", statsColumns = Seq("id"))
    Snapshots.commit(frame(8000 until 12000, "b2").coalesce(1), dir,
      "append", statsColumns = Seq("id"))
    (0 until 3).foreach { i =>
      Snapshots.commit(
        frame(20000 + i * 10 until 20000 + i * 10 + 10, s"s$i").coalesce(1),
        dir, "append", statsColumns = Seq("id"))
    }
    // masks in both worlds: big-file rows survive consolidation,
    // small-file rows are applied by the rewrite and become inert
    Snapshots.deleteWhere(spark, dir, col("id").isin(3L, 20001L, 20012L))
    Snapshots.writeMetadataCheckpoint(spark, dir)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val m0 = Snapshots.readManifest(spark, dir, v0)
    assert(m0.files.size === 6 && m0.files.forall(m0.fileBytes.contains))
    val sizes = m0.files.map(m0.fileBytes)
    val minBytes = (sizes.min + sizes.max) / 2
    val smalls = m0.files.filter(r => m0.fileBytes(r) < minBytes).toSet
    assert(smalls.size === 3)
    val expectedSegs = owningSegs(dir, v0, smalls)
    val pre = Snapshots.readVersion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val (v1, touched) = recordTouches {
      Snapshots.compactSmall(spark, dir, minBytes, statsColumns = Seq("id"))
    }
    assert(v1 === v0 + 1)
    assert(touched.nonEmpty && touched.subsetOf(expectedSegs),
      s"thin compactSmall consulted segments beyond the smalls' own: " +
        s"touched=$touched expected⊆$expectedSegs")

    val m1 = Snapshots.readManifest(spark, dir, v1)
    // bigs carried by reference with their stats; smalls folded away
    val bigs = m0.files.filterNot(smalls)
    assert(bigs.forall(m1.files.contains))
    assert(bigs.forall(r => m1.stats.contains((r, "id"))),
      "carried files' stats must survive the delta publish")
    assert(m1.files.count(smalls) === 0)
    val fresh = m1.files.filterNot(m0.files.contains)
    assert(fresh.nonEmpty && fresh.forall(r => m1.stats.contains((r, "id"))),
      "the rewrite's own files must carry fresh footer stats")
    // mask consolidation: only the big-file mask row survives
    assert(m1.dvRows === 1L)
    // ledger + content exact
    val post = Snapshots.readVersion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post === pre)
    assert(m1.dataRows - m1.dvRows === pre.size.toLong)
    // the readManifest ∘ publish identity held for the delta path too:
    // per-file ledgers cover every live file
    assert(m1.files.forall(m1.fileBytes.contains) &&
      m1.files.forall(m1.fileRows.contains))
    // idempotence through the thin path: nothing small left
    assert(Snapshots.compactSmall(spark, dir, minBytes) === v1)
  }

  test("delta publish fold rule: a segment at-most-half alive is " +
    "dropped and its survivor folds into the fresh segment with " +
    "metadata intact") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    // ONE commit, THREE files via partition dirs (deterministic sizes:
    // one file per partition value): two small, one big
    val df = ((0 until 10).map(i => (i.toLong, "s1")) ++
      (100 until 110).map(i => (i.toLong, "s2")) ++
      (1000 until 5000).map(i => (i.toLong, "big"))).toDF("id", "p")
    Snapshots.commit(df.coalesce(1), dir, "overwrite",
      partitionBy = Seq("p"), statsColumns = Seq("id"))
    Snapshots.writeMetadataCheckpoint(spark, dir)
    val m0 = Snapshots.readManifest(spark, dir, 0L)
    assert(m0.files.size === 3 && m0.segments.size === 1)
    val oldSeg = m0.segments.head
    val sizes = m0.files.map(m0.fileBytes)
    val minBytes = (sizes.min + sizes.max) / 2
    val bigRel = m0.files.maxBy(m0.fileBytes)
    val pre = Snapshots.readVersion(spark, dir).count()

    val (v1, touched) = recordTouches {
      Snapshots.compactSmall(spark, dir, minBytes)
    }
    // the one segment IS touched (2 of 3 removed → fold), by design
    assert(touched === Set(oldSeg))
    val m1 = Snapshots.readManifest(spark, dir, v1)
    // ref dropped — no tombstone pile-up on a mostly-dead segment
    assert(!m1.segments.contains(oldSeg),
      "an at-most-half-alive segment's ref must be dropped, not carried")
    // the big survivor folded forward with its stats and ledger
    assert(m1.files.contains(bigRel))
    assert(m1.stats.contains((bigRel, "id")),
      "folded survivor must keep its stats")
    assert(m1.fileRows.get(bigRel) === m0.fileRows.get(bigRel))
    assert(Snapshots.readVersion(spark, dir).count() === pre)
  }

  test("thin clusterTail: only the tail's segments consulted; bucket " +
    "mapping completed; sorted markers recorded on the fresh files") {
    val dir = freshDir()
    // bucketed + sorted bulk, then two plain (unbucketed) appends
    Snapshots.commit(frame(0 until 2000, "bulk"), dir, "overwrite",
      bucketBy = Some(("id", 4)), statsColumns = Seq("id"),
      sortBuckets = true)
    Snapshots.commit(frame(2000 until 2050, "t0").coalesce(1), dir, "append")
    Snapshots.commit(frame(2050 until 2100, "t1").coalesce(1), dir, "append")
    Snapshots.writeMetadataCheckpoint(spark, dir)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val m0 = Snapshots.readManifest(spark, dir, v0)
    val tail = m0.files.filterNot(m0.buckets.contains).toSet
    assert(tail.size === 2)
    val expectedSegs = owningSegs(dir, v0, tail)
    val pre = Snapshots.readVersion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val (v1, touched) = recordTouches {
      Snapshots.clusterTail(spark, dir, statsColumns = Seq("id"),
        sort = true)
    }
    assert(v1 === v0 + 1)
    assert(touched.nonEmpty && touched.subsetOf(expectedSegs),
      s"thin clusterTail consulted segments beyond the tail's own: " +
        s"touched=$touched expected⊆$expectedSegs")
    val m1 = Snapshots.readManifest(spark, dir, v1)
    assert(m1.files.forall(m1.buckets.contains),
      "every file must carry a bucket id after the tail re-cluster")
    val fresh = m1.files.filterNot(m0.files.contains)
    assert(fresh.nonEmpty && fresh.forall(r =>
      m1.sortedFiles.get(r).contains("id")),
      "sort=true tail rewrite must record sorted markers")
    // the sorted bulk kept ITS markers through the verbatim carry
    val bulk = m0.files.filter(m0.sortedFiles.contains)
    assert(bulk.nonEmpty && bulk.forall(r =>
      m1.sortedFiles.get(r) === m0.sortedFiles.get(r)))
    val post = Snapshots.readVersion(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post === pre)
    // idempotent through the thin path
    assert(Snapshots.clusterTail(spark, dir) === v1)
  }

  test("thin purgeDeletes: only the masked file's segment consulted; " +
    "stats inherited; mask dropped; ledger exact") {
    val dir = freshDir()
    (0 until 3).foreach { i =>
      Snapshots.commit(frame(i * 100 until i * 100 + 100, s"f$i").coalesce(1),
        dir, if (i == 0) "overwrite" else "append",
        statsColumns = Seq("id"))
    }
    Snapshots.deleteWhere(spark, dir, col("id") < 10L) // masks file 0 only
    Snapshots.writeMetadataCheckpoint(spark, dir)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val m0 = Snapshots.readManifest(spark, dir, v0)
    val masked = m0.files.head
    val expectedSegs = owningSegs(dir, v0, Set(masked))

    val (v1, touched) = recordTouches {
      Snapshots.purgeDeletes(spark, dir)
    }
    assert(v1 === v0 + 1)
    assert(touched.subsetOf(expectedSegs),
      s"thin purge consulted segments beyond the masked file's own: " +
        s"touched=$touched expected⊆$expectedSegs")
    val m1 = Snapshots.readManifest(spark, dir, v1)
    assert(m1.dvs.isEmpty && m1.dvRows === 0L)
    assert(!m1.files.contains(masked))
    val fresh = m1.files.filterNot(m0.files.contains)
    assert(fresh.nonEmpty && fresh.forall(r => m1.stats.contains((r, "id"))),
      "purge must inherit stat coverage onto the rewritten files")
    assert(m1.dataRows === 290L)
    assert(Snapshots.readVersion(spark, dir).count() === 290L)
    // maskless purge through the thin path: a pure-metadata version
    // bump that carries EVERY segment verbatim — zero touches
    val (v2, touched2) = recordTouches { Snapshots.purgeDeletes(spark, dir) }
    assert(v2 === v1 + 1)
    assert(touched2.isEmpty,
      s"a maskless thin purge must consult no segment, got $touched2")
    assert(Snapshots.readVersion(spark, dir).count() === 290L)
  }

  test("thin appends (r16): an append consults ZERO segments, carries " +
    "masks and metadata verbatim, and equals the full publish " +
    "map-for-map") {
    val thinDir = freshDir()
    val fullDir = freshDir()
    def seed(d: String): Unit = {
      Snapshots.commit(frame(0 until 500, "a").coalesce(1), d, "overwrite",
        statsColumns = Seq("id"), bloomColumns = Seq("id"),
        ndvColumns = Seq("id"))
      Snapshots.commit(frame(500 until 900, "b").coalesce(1), d, "append",
        statsColumns = Seq("id"))
      Snapshots.deleteWhere(spark, d, col("id").isin(3L, 501L))
    }
    seed(thinDir); seed(fullDir)
    val batch = frame(2000 until 2100, "tail").coalesce(1)
    // thin side: the append must touch NO segment (no candidates, no
    // folds — refs carried verbatim)
    val (_, touched) = recordTouches {
      Snapshots.commit(batch, thinDir, "append", statsColumns = Seq("id"))
    }
    assert(touched.isEmpty,
      s"a thin append must consult no segment, got $touched")
    // full side: same append with the thin path disabled
    try {
      spark.conf.set("graft.commit.thinAppend.enabled", "false")
      Snapshots.commit(batch, fullDir, "append", statsColumns = Seq("id"))
    } finally spark.conf.unset("graft.commit.thinAppend.enabled")
    val mT = Snapshots.readManifest(spark, thinDir,
      Snapshots.latestVersion(spark, thinDir).get)
    val mF = Snapshots.readManifest(spark, fullDir,
      Snapshots.latestVersion(spark, fullDir).get)
    // map-for-map equality up to the dirs' own uuid'd file names:
    // counts, ledgers, stat/bloom coverage, mask accounting
    assert(mT.files.size === mF.files.size)
    assert(mT.dataRows === mF.dataRows && mT.dvRows === mF.dvRows)
    assert(mT.stats.size === mF.stats.size)
    assert(mT.blooms.size === mF.blooms.size)
    assert(mT.ndvs.size === mF.ndvs.size)
    assert(mT.fileRows.values.toSeq.sorted ===
      mF.fileRows.values.toSeq.sorted)
    assert(mT.schema === mF.schema)
    // content identical, masks survived the thin carry
    val a = Snapshots.readVersion(spark, thinDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Snapshots.readVersion(spark, fullDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    assert(!a.exists(_._1 == 3L) && !a.exists(_._1 == 501L),
      "masked rows must stay masked through a thin append")
    // the new files' fresh metadata landed in the delta's segment
    val fresh = mT.files.filterNot(r => r.contains("v000000") ||
      r.contains("v000001"))
    assert(fresh.nonEmpty && fresh.forall(r => mT.stats.contains((r, "id"))))
    // a WIDENING append falls back to the full publish (carried
    // blooms/stats must filter per the widening rules) and still
    // lands exactly — pinned on a fresh int-keyed table
    val wDir = freshDir()
    Snapshots.commit(frame(0 until 100, "x").coalesce(1)
        .select(col("id").cast("int").as("id"), col("tag")),
      wDir, "overwrite", statsColumns = Seq("id"))
    val (_, wTouched) = recordTouches {
      Snapshots.commit(frame(100 until 150, "y").coalesce(1)
          .select(col("id").cast("long").as("id"), col("tag")),
        wDir, "append", statsColumns = Seq("id"))
    }
    assert(wTouched.nonEmpty,
      "a widening append must take the full path (carried stats filter)")
    val mW = Snapshots.readManifest(spark, wDir, 1L)
    assert(mW.schema.get("id").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(Snapshots.readVersion(spark, wDir).count() === 150L)
  }

  test("thin DML (r17): a MERGE consults only the key range's " +
    "segments, an UPDATE only the predicate's, both publish " +
    "zero-removal deltas that equal the full path map-for-map") {
    val s = spark
    import s.implicits._
    def seed(d: String): Unit = {
      // three range-sliced commits with key stats → three segments
      (0 until 3).foreach { i =>
        Snapshots.commit(frame(i * 1000 until i * 1000 + 1000, s"b$i")
            .coalesce(1), d,
          if (i == 0) "overwrite" else "append", statsColumns = Seq("id"))
      }
      Snapshots.writeMetadataCheckpoint(spark, d)
    }
    val thinDir = freshDir(); val fullDir = freshDir()
    seed(thinDir); seed(fullDir)
    // the CDC batch: one update + one delete in slice 1, one insert
    def batch() = Seq(
      (1005L, "U", "upd"), (1006L, "D", null), (9999L, "I", "ins"))
      .toDF("id", "op", "tag").select(col("id"), col("tag"), col("op"))
    val v0 = Snapshots.latestVersion(spark, thinDir).get
    // with a covering checkpoint the thin merge consults NO segment:
    // mask candidates come from the checkpoint job, the publish
    // carries every ref verbatim (zero removals)
    val (vT, touched) = recordTouches {
      Snapshots.mergeOnRead(spark, thinDir, batch(), "id",
        statsColumns = Seq("id"))
    }
    assert(vT === v0 + 1)
    assert(touched.isEmpty,
      s"a checkpoint-covered thin merge must consult no segment, " +
        s"got $touched")
    val vF = try {
      spark.conf.set("graft.commit.thinDml.enabled", "false")
      Snapshots.mergeOnRead(spark, fullDir, batch(), "id",
        statsColumns = Seq("id"))
    } finally spark.conf.unset("graft.commit.thinDml.enabled")
    val mT = Snapshots.readManifest(spark, thinDir, vT)
    val mF = Snapshots.readManifest(spark, fullDir, vF)
    assert(mT.files.size === mF.files.size)
    assert(mT.dataRows === mF.dataRows && mT.dvRows === mF.dvRows)
    assert(mT.stats.size === mF.stats.size)
    assert(mT.fileRows.values.toSeq.sorted === mF.fileRows.values.toSeq.sorted)
    assert(mT.schema === mF.schema)
    def content(d: String) = Snapshots.readVersion(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val cT = content(thinDir)
    assert(cT === content(fullDir))
    assert(cT.contains((1005L, "upd")) && cT.contains((9999L, "ins")) &&
      !cT.exists(_._1 == 1006L),
      "merge semantics must hold through the thin path")
    // UPDATE under a fresh covering checkpoint: same zero-touch
    // contract; the predicate's range hints prune candidates inside
    // the checkpoint job
    val v1 = Snapshots.latestVersion(spark, thinDir).get
    Snapshots.writeMetadataCheckpoint(spark, thinDir)
    val m1 = Snapshots.readManifest(spark, thinDir, v1)
    val (vU, uTouched) = recordTouches {
      Snapshots.updateWhere(spark, thinDir,
        col("id").between(10L, 20L), Map("tag" -> lit("patched")))
    }
    assert(vU === v1 + 1)
    assert(uTouched.isEmpty,
      s"a checkpoint-covered thin update must consult no segment, " +
        s"got $uTouched")
    try {
      spark.conf.set("graft.commit.thinDml.enabled", "false")
      Snapshots.updateWhere(spark, fullDir,
        col("id").between(10L, 20L), Map("tag" -> lit("patched")))
    } finally spark.conf.unset("graft.commit.thinDml.enabled")
    assert(content(thinDir) === content(fullDir),
      "update content must match the full path")
    assert((10L to 20L).forall(i => content(thinDir).contains((i, "patched"))))
    val mU = Snapshots.readManifest(spark, thinDir, vU)
    // zero-removal delta: every pre-existing live file still live
    assert(m1.files.forall(mU.files.contains),
      "a thin UPDATE must carry every base file by reference")
    // sensitivity check: with the thin path disabled the SAME merge
    // takes the full publish, whose base resolve consults segments —
    // proving the zero-touch assertions above measure a real
    // difference, not a blind hook
    val (_, fTouched) = recordTouches {
      try {
        spark.conf.set("graft.commit.thinDml.enabled", "false")
        Snapshots.mergeOnRead(spark, thinDir, batch(), "id",
          statsColumns = Seq("id"))
      } finally spark.conf.unset("graft.commit.thinDml.enabled")
    }
    assert(fTouched.nonEmpty,
      "the full merge path must consult segments (hook sanity)")
  }

  test("thin DELETE (r18): a checkpoint-covered predicate DELETE " +
    "consults ZERO segments, publishes a zero-removal dv delta that " +
    "equals the full path, and the full path still consults segments") {
    val s = spark
    import s.implicits._
    def seed(d: String): Unit = {
      (0 until 3).foreach { i =>
        Snapshots.commit(frame(i * 1000 until i * 1000 + 1000, s"b$i")
            .coalesce(1), d,
          if (i == 0) "overwrite" else "append", statsColumns = Seq("id"))
      }
      Snapshots.writeMetadataCheckpoint(spark, d)
    }
    val thinDir = freshDir(); val fullDir = freshDir()
    seed(thinDir); seed(fullDir)
    val v0 = Snapshots.latestVersion(spark, thinDir).get
    // the retention shape: a range predicate whose stat verdicts prune
    // candidates inside the checkpoint job; the driver consults NO
    // segment — mask candidates come from the planning job, the
    // publish carries every ref verbatim
    val pred = col("id").between(1005L, 1020L)
    val (vT, touched) = recordTouches {
      Snapshots.deleteWhere(spark, thinDir, pred)
    }
    assert(vT === v0 + 1)
    assert(touched.isEmpty,
      s"a checkpoint-covered thin delete must consult no segment, " +
        s"got $touched")
    val vF = try {
      spark.conf.set("graft.commit.thinDml.enabled", "false")
      Snapshots.deleteWhere(spark, fullDir, pred)
    } finally spark.conf.unset("graft.commit.thinDml.enabled")
    val mT = Snapshots.readManifest(spark, thinDir, vT)
    val mF = Snapshots.readManifest(spark, fullDir, vF)
    // zero-removal delta: every base file carried live, only dv refs new
    assert(mT.files.size === mF.files.size &&
      mT.dataRows === mF.dataRows && mT.dvRows === mF.dvRows)
    assert(mT.dvRows === 16L)
    assert(mT.stats.size === mF.stats.size)
    def content(d: String) = Snapshots.readVersion(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val cT = content(thinDir)
    assert(cT === content(fullDir), "delete content must match full path")
    assert(!cT.exists(t => t._1 >= 1005L && t._1 <= 1020L) &&
      cT.exists(_._1 == 1004L) && cT.exists(_._1 == 1021L),
      "exactly the predicate's rows must be masked")
    // a nothing-matched DELETE stays a no-op (no empty commit) on the
    // thin path too
    val (vN, nTouched) = recordTouches {
      Snapshots.deleteWhere(spark, thinDir, col("id") === 999999L)
    }
    assert(vN === vT && nTouched.isEmpty)
    // sensitivity: the full path's base resolve consults segments —
    // the zero-touch assertions above measure a real difference
    val (_, fTouched) = recordTouches {
      try {
        spark.conf.set("graft.commit.thinDml.enabled", "false")
        Snapshots.deleteWhere(spark, thinDir, col("id") === 42L)
      } finally spark.conf.unset("graft.commit.thinDml.enabled")
    }
    assert(fTouched.nonEmpty,
      "the full delete path must consult segments (hook sanity)")
  }

  test("randomized thin-vs-full parity: identical op sequences on a " +
    "checkpointed and an uncheckpointed table converge to the same " +
    "observable state") {
    val rnd = new scala.util.Random(411)
    (0 until 2).foreach { trial =>
      val thinDir = freshDir()
      val fullDir = freshDir()
      var lo = 0
      def nextSlab(n: Int): Range = { val r = lo until lo + n; lo += n; r }
      def bothCommit(ids: Range, tag: String): Unit =
        Seq(thinDir, fullDir).foreach { d =>
          Snapshots.commit(frame(ids, tag).coalesce(1), d,
            if (ids.start == 0) "overwrite" else "append",
            statsColumns = Seq("id"))
        }
      bothCommit(nextSlab(3000), "base")
      (0 until 4).foreach(i => bothCommit(nextSlab(10 + rnd.nextInt(20)), s"s$i"))
      // random masks, same predicate both sides
      val cut = rnd.nextInt(40)
      Seq(thinDir, fullDir).foreach(d =>
        Snapshots.deleteWhere(spark, d, col("id") % 97L === cut.toLong))
      // only thinDir gets a checkpoint → its maintenance goes delta
      Snapshots.writeMetadataCheckpoint(spark, thinDir)
      val mT = Snapshots.readManifest(spark, thinDir,
        Snapshots.latestVersion(spark, thinDir).get)
      val sizes = mT.files.map(mT.fileBytes)
      val minBytes = (sizes.min + sizes.max) / 2
      val op = rnd.nextInt(2)
      Seq(thinDir, fullDir).foreach { d =>
        if (op == 0) Snapshots.compactSmall(spark, d, minBytes,
          statsColumns = Seq("id"))
        else Snapshots.purgeDeletes(spark, d, statsColumns = Seq("id"))
      }
      val a = Snapshots.readVersion(spark, thinDir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val b = Snapshots.readVersion(spark, fullDir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(a === b, s"trial $trial op $op: content diverged")
      val m1 = Snapshots.readManifest(spark, thinDir,
        Snapshots.latestVersion(spark, thinDir).get)
      val m2 = Snapshots.readManifest(spark, fullDir,
        Snapshots.latestVersion(spark, fullDir).get)
      assert(m1.dataRows === m2.dataRows, s"trial $trial: dataRows diverged")
      assert(m1.dvRows === m2.dvRows, s"trial $trial: dvRows diverged")
      assert(m1.files.size === m2.files.size,
        s"trial $trial: file counts diverged")
      assert(m1.stats.size === m2.stats.size,
        s"trial $trial: stat coverage diverged")
    }
  }
}
