package graft.sources

import graft.{SparkSpec, TempDirs}
import org.apache.hadoop.fs.{FileSystem, Path}

/** The object-store commit seam: graft's CAS point is pluggable
  * ([[CommitArbiter]]), because S3-class stores have no atomic
  * create-if-absent — rename is copy+delete and silently OVERWRITES,
  * so without external arbitration two writers publishing the same
  * version would both "succeed" and one commit would be silently
  * lost. These specs (a) reproduce that lost-commit hazard against a
  * faked non-atomic store primitive, then (b) run the full 8-writer
  * commit race THROUGH the same faked store with the coordinated
  * arbiter plugged in, proving the CAS loser still loses when the
  * filesystem can't arbitrate.
  */
class CommitArbiterSpec extends SparkSpec {

  private def localFs: FileSystem =
    FileSystem.getLocal(spark.sparkContext.hadoopConfiguration).getRaw

  private def writeTmp(dir: String, name: String, content: String): Path = {
    val p = new Path(dir, name)
    val o = localFs.create(p, true)
    try o.write(content.getBytes("UTF-8")) finally o.close()
    p
  }

  /** A test-local process-wide coordinator (the claims-for-lifetime
    * shape of [[CoordinatedCommitArbiter.processWide]], fresh per test
    * so claims cannot leak across tests).
    */
  private def freshCoordinator(): CoordinatedCommitArbiter.Coordinator =
    new CoordinatedCommitArbiter.Coordinator {
      private val seq = new java.util.concurrent.atomic.AtomicLong()
      private val claims =
        new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
      override def claim(key: String): Option[Long] = {
        val t = java.lang.Long.valueOf(seq.incrementAndGet())
        if (claims.putIfAbsent(key, t) == null) Some(t.longValue) else None
      }
      override def release(key: String, token: Long): Unit =
        claims.remove(key, java.lang.Long.valueOf(token))
    }

  /** An S3-style PUT: visibility-ATOMIC per object (readers see the
    * old object or the new one, never partial bytes — emulated via a
    * hidden copy + POSIX overwrite-rename) but last-writer-wins: it
    * OVERWRITES silently and offers no if-absent. Exactly the store
    * semantics the commit protocol cannot build a CAS from alone.
    */
  private def objectStorePut(f: FileSystem, tmp: Path, dst: Path): Unit = {
    val hidden = new Path(dst.getParent, s".put-${dst.getName}-${Thread.currentThread().getId}")
    val in = f.open(tmp)
    val out = f.create(hidden, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096)
    finally { in.close(); out.close() }
    // POSIX rename overwrites atomically — the PUT's visibility edge
    assert(new java.io.File(hidden.toUri.getPath)
      .renameTo(new java.io.File(dst.toUri.getPath)))
    f.delete(tmp, false)
  }

  /** The hazard: an existence check a writer might do, then the PUT —
    * check-then-act is NOT atomic. The barrier parks both racers
    * between check and act, the worst (and on a contended store,
    * common) interleaving.
    */
  private class NaiveObjectStoreArbiter(barrier: java.util.concurrent.CyclicBarrier)
    extends CommitArbiter {
    override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean = {
      if (f.exists(dst)) return false
      barrier.await() // both racers passed the existence check
      objectStorePut(f, tmp, dst)
      true
    }
  }

  test("a non-atomic store's raw put loses commits: both racers 'win'") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = TempDirs.create("arbiter-naive")
    val f = localFs
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val naive = new NaiveObjectStoreArbiter(barrier)
    val dst = new Path(dir, "v1.manifest")
    val racers = Seq("writer-A", "writer-B").map { w =>
      Future {
        val tmp = writeTmp(dir, s".tmp-$w", w)
        naive.putIfAbsent(f, tmp, dst)
      }
    }
    val wins = Await.result(Future.sequence(racers), 60.seconds)
    // THE HAZARD: both returned true — whichever copy landed second
    // silently destroyed the other's commit
    assert(wins === Seq(true, true),
      "the faked store must exhibit the lost-commit race")
  }

  test("coordinated arbiter over the same non-atomic store: exactly one " +
    "winner, even with both racers inside the install window") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = TempDirs.create("arbiter-coord")
    val f = localFs
    val started = new java.util.concurrent.CyclicBarrier(2)
    // fresh coordinator per test (claims are per-key for its lifetime)
    val coord = freshCoordinator()
    val arb = new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst: Path): Boolean = {
        objectStorePut(fs0, tmp, dst) // still the overwrite-capable put
        true
      }
    }
    val dst = new Path(dir, "v1.manifest")
    val racers = Seq("writer-A", "writer-B").map { w =>
      Future {
        val tmp = writeTmp(dir, s".tmp-$w", w)
        started.await() // maximal contention on the claim
        arb.putIfAbsent(f, tmp, dst)
      }
    }
    val wins = Await.result(Future.sequence(racers), 60.seconds)
    assert(wins.count(identity) === 1, s"exactly one winner, got $wins")
    // the loser's tmp is left for caller cleanup (the contract)
    assert(localFs.exists(dst))
    // a replayed claimant (new tmp, same dst) loses on the recovery
    // check even with a fresh coordinator — dst exists
    val freshArb = new CoordinatedCommitArbiter()
    val tmp2 = writeTmp(dir, ".tmp-replay", "replay")
    assert(!freshArb.putIfAbsent(f, tmp2, dst))
  }

  test("a FAILED install releases the claim: the version stays " +
    "committable instead of wedging (ADVICE r13)") {
    val dir = TempDirs.create("arbiter-failed-install")
    val f = localFs
    val coord = CoordinatedCommitArbiter.processWide
    val dst = new Path(dir, "v1.manifest")
    // a store whose install REFUSES once (returned false, dst never
    // created) and then recovers — a transient object-store error
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val arb = new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean =
        if (failures.getAndDecrement() > 0) false
        else { objectStorePut(fs0, tmp, dst0); true }
    }
    val tmp1 = writeTmp(dir, ".tmp-a", "attempt-1")
    assert(!arb.putIfAbsent(f, tmp1, dst), "the refused install must lose")
    assert(!localFs.exists(dst))
    // pre-fix behavior: the claim was consumed forever, so this retry
    // (and every later writer in the process) lost while dst stayed
    // absent — Snapshots.commit would conflict on the same version
    // forever. Post-fix: the released claim lets the retry land.
    val tmp2 = writeTmp(dir, ".tmp-b", "attempt-2")
    assert(arb.putIfAbsent(f, tmp2, dst), "the retry must win the version")
    val in = scala.io.Source.fromFile(dst.toUri.getPath)
    try assert(in.mkString === "attempt-2") finally in.close()
  }

  test("leased coordinator: a claimant that crashes between claim and " +
    "install cannot wedge the version — a second writer lands it " +
    "exactly once after lease expiry") {
    val dir = TempDirs.create("arbiter-lease-crash")
    val f = localFs
    var now = 0L // injectable clock — expiry is driven, never slept
    val coord = CoordinatedCommitArbiter.leased(1000L, () => now)
    val dst = new Path(dir, "v1.manifest")
    // writer A: claims, then CRASHES before its install ever runs —
    // the process dies holding the grant, so nothing can release it
    // (the liveness hole only a lease can close)
    val key = f.makeQualified(dst).toUri.toString
    assert(coord.claim(key).nonEmpty, "writer A's dying claim")
    // writer B (another thread — release/takeover are token-guarded):
    // inside A's lease window the version is protected …
    val arbB = new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean = {
        objectStorePut(fs0, tmp, dst0); true
      }
    }
    def inThread[T](body: => T): T = {
      var out: Option[T] = None
      var err: Option[Throwable] = None
      val t = new Thread(() =>
        try out = Some(body) catch { case e: Throwable => err = Some(e) })
      t.start(); t.join()
      err.foreach(throw _)
      out.get
    }
    val tmpB = writeTmp(dir, ".tmp-b", "writer-B")
    assert(!inThread(arbB.putIfAbsent(f, tmpB, dst)),
      "inside the lease window the crashed claim must still exclude")
    // … and after expiry the takeover lands the version exactly once
    now = 2000L
    assert(inThread(arbB.putIfAbsent(f, tmpB, dst)))
    val in = scala.io.Source.fromFile(dst.toUri.getPath)
    try assert(in.mkString === "writer-B") finally in.close()
    // replay of A (process restart) loses on the dst recheck
    val tmpA2 = writeTmp(dir, ".tmp-a2", "writer-A-replay")
    assert(!new CoordinatedCommitArbiter(coord).putIfAbsent(f, tmpA2, dst))
  }

  test("a THROWN install with dst verifiably absent releases the claim: " +
    "a second writer lands the version immediately — no lease expiry, " +
    "no process death (VERDICT r14 task #5)") {
    val dir = TempDirs.create("arbiter-thrown-release")
    val f = localFs
    val coord = freshCoordinator() // process-lifetime claims, NO expiry
    val dst = new Path(dir, "v1.manifest")
    val failures = new java.util.concurrent.atomic.AtomicInteger(1)
    val arb = new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean =
        if (failures.getAndDecrement() > 0)
          throw new java.io.IOException("store error before acting")
        else { objectStorePut(fs0, tmp, dst0); true }
    }
    val tmpA = writeTmp(dir, ".tmp-a", "attempt-1")
    intercept[java.io.IOException] { arb.putIfAbsent(f, tmpA, dst) }
    assert(!localFs.exists(dst))
    // pre-fix behavior: the thrown install kept the claim for the
    // holder's lifetime, wedging the version in a no-TTL coordinator.
    // Post-fix: dst was probed absent after the throw, the claim was
    // released, and the very next writer lands it.
    val tmpB = writeTmp(dir, ".tmp-b", "attempt-2")
    assert(arb.putIfAbsent(f, tmpB, dst),
      "the next writer must land the version without waiting out a lease")
    val in = scala.io.Source.fromFile(dst.toUri.getPath)
    try assert(in.mkString === "attempt-2") finally in.close()
  }

  test("an install whose REPORT lies but whose copy landed dst is " +
    "adjudicated by dst's state: returned-false and thrown installs " +
    "both report success, keep the claim, and a retry cannot " +
    "overwrite the visible commit (ADVICE r14)") {
    val dir = TempDirs.create("arbiter-landed-report")
    val f = localFs
    // leg 1: install lands dst, then returns FALSE (an S3-class
    // copy+delete rename whose delete leg failed)
    val coordA = freshCoordinator()
    val arbFalse = new CoordinatedCommitArbiter(coordA) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean = {
        objectStorePut(fs0, tmp, dst0); false
      }
    }
    val dstA = new Path(dir, "vA.manifest")
    val tmpA = writeTmp(dir, ".tmp-a", "landed-A")
    assert(arbFalse.putIfAbsent(f, tmpA, dstA),
      "dst landed ⇒ the commit is visible ⇒ success, whatever the report")
    assert(!localFs.exists(tmpA), "tmp is consumed on success")
    // pre-fix hazard: the false report released the claim and a retry
    // OVERWROTE the visible commit; post-fix the claim is kept and the
    // retry loses on the dst recheck
    val tmpA2 = writeTmp(dir, ".tmp-a2", "landed-A-retry")
    assert(!arbFalse.putIfAbsent(f, tmpA2, dstA))
    val inA = scala.io.Source.fromFile(dstA.toUri.getPath)
    try assert(inA.mkString === "landed-A") finally inA.close()
    // leg 2: install lands dst, then THROWS (response lost after the
    // copy) — same adjudication
    val coordB = freshCoordinator()
    val arbThrow = new CoordinatedCommitArbiter(coordB) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean = {
        objectStorePut(fs0, tmp, dst0)
        throw new java.io.IOException("response lost after the copy")
      }
    }
    val dstB = new Path(dir, "vB.manifest")
    val tmpB = writeTmp(dir, ".tmp-b", "landed-B")
    assert(arbThrow.putIfAbsent(f, tmpB, dstB))
    assert(!localFs.exists(tmpB))
    val inB = scala.io.Source.fromFile(dstB.toUri.getPath)
    try assert(inB.mkString === "landed-B") finally inB.close()
  }

  test("leased coordinator: an expired claim whose install actually " +
    "LANDED never double-commits, and a stale holder's release cannot " +
    "evict a takeover") {
    val dir = TempDirs.create("arbiter-lease-landed")
    val f = localFs
    var now = 0L
    val coord = CoordinatedCommitArbiter.leased(1000L, () => now)
    val dst = new Path(dir, "v1.manifest")
    val arb = new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst0: Path): Boolean = {
        objectStorePut(fs0, tmp, dst0); true
      }
    }
    val tmpA = writeTmp(dir, ".tmp-a", "writer-A")
    assert(arb.putIfAbsent(f, tmpA, dst))
    now = 5000L // A's lease long expired — but its commit LANDED
    val tmpB = writeTmp(dir, ".tmp-b", "writer-B")
    assert(!arb.putIfAbsent(f, tmpB, dst),
      "the verified-absent-dst recheck must refuse the takeover")
    val in = scala.io.Source.fromFile(dst.toUri.getPath)
    try assert(in.mkString === "writer-A") finally in.close()
    // token-guarded release: a grant survives a stale release bearing
    // another grant's token (JVM thread ids are reused; per-grant
    // fencing tokens are not — ADVICE r14)
    val key = "k-fence"
    val t1 = coord.claim(key).get // current grant
    coord.release(key, t1 + 999L) // a stale/forged token
    assert(coord.claim(key).isEmpty, "a non-holder release must be a no-op")
    coord.release(key, t1) // the true grant's token does free it
    assert(coord.claim(key).nonEmpty)
  }

  test("arbiter registry matches on path-segment boundaries, never raw " +
    "string prefixes") {
    val boom = new CommitArbiter {
      override def putIfAbsent(f: FileSystem, tmp: Path,
                               dst: Path): Boolean =
        throw new IllegalStateException("wrong table routed here")
    }
    CommitArbiters.register("/wh-arbtest/t1", boom)
    try {
      assert(CommitArbiters.forPath(
        new Path("/wh-arbtest/t1/_manifests/v0.manifest")) eq boom)
      // /wh-arbtest/t10 shares the string prefix but is another table
      assert(CommitArbiters.forPath(
        new Path("/wh-arbtest/t10/_manifests/v0.manifest")) eq FsCommitArbiter)
      assert(CommitArbiters.forPath(
        new Path("/elsewhere/x")) eq FsCommitArbiter)
    } finally CommitArbiters.unregister("/wh-arbtest/t1")
  }

  test("the full 8-writer commit race through a faked object store: " +
    "version chain intact, no rows lost, CAS losers really lose") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val s = spark
    import s.implicits._
    val dir = TempDirs.create("arbiter-store-table")
    val coord = freshCoordinator()
    // every publish under this table routes through the coordinated
    // arbiter whose install is the overwrite-capable put — if the
    // arbitration leaked even one double-win, a manifest would be
    // silently replaced and a writer's rows lost
    CommitArbiters.register(dir, new CoordinatedCommitArbiter(coord) {
      override protected def install(fs0: FileSystem, tmp: Path,
                                     dst: Path): Boolean = {
        objectStorePut(fs0, tmp, dst) // still the overwrite-capable put
        true
      }
    })
    try {
      def frame(r: Range, tag: String) =
        r.map(i => (i.toLong, tag)).toDF("k", "tag")
      Snapshots.commit(frame(0 until 1, "base"), dir)
      val writers = (1 to 8).map { i =>
        Future(Snapshots.commitRetry(
          frame(i * 100 until i * 100 + i, s"w$i"), dir, "append",
          maxAttempts = 32))
      }
      val versions = Await.result(Future.sequence(writers), 120.seconds)
      assert(versions.sorted === (1L to 8L))
      val byTag = Snapshots.readVersion(spark, dir)
        .groupBy("tag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byTag ===
        (1 to 8).map(i => s"w$i" -> i.toLong).toMap + ("base" -> 1L))
      // same-version CAS: the loser throws, the winner's rows serve
      Snapshots.commit(frame(0 until 7, "winner"), dir, "overwrite",
        expectedVersion = Some(9L))
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.commit(frame(0 until 2, "loser"), dir, "overwrite",
          expectedVersion = Some(9L))
      }
      assert(Snapshots.readVersion(spark, dir, Some(9L)).count() === 7L)
    } finally CommitArbiters.unregister(dir)
  }
}
