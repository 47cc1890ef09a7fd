package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit protocol's ONE store-dependent primitive, made a seam.
  *
  * Every graft commit funnels through a single compare-and-swap:
  * "install this fully-written temp file at the versioned destination
  * iff nothing is there yet; exactly one concurrent claimant wins."
  * On a local filesystem or HDFS that primitive exists natively
  * (hard-link-if-absent / atomic rename), which is what
  * [[FsCommitArbiter]] does and what [[Snapshots]] always did. On
  * S3-class object stores it does NOT: rename is copy+delete,
  * silently overwrites, and two writers publishing the same version
  * would both "succeed" — the classic lost-commit failure every
  * object-store table format (Delta's LogStore, Iceberg's lock-based
  * catalogs) solves with an EXTERNAL arbiter. This trait is that
  * LogStore-shaped seam: deployments on non-atomic stores plug an
  * arbiter whose mutual exclusion lives where the store can't provide
  * it (a DynamoDB-style conditional put, ZooKeeper, a database
  * unique-key insert), and the rest of the commit protocol — version
  * chains, conflict signaling, cleanup — is untouched, because it
  * only ever consumed the boolean.
  *
  * Contract ([[Snapshots]] depends on each clause):
  *   - `tmp` is fully written and closed before the call.
  *   - Returns true iff `tmp`'s content is installed at `dst` BY THIS
  *     call; at most one concurrent call per `dst` may return true,
  *     and after it returns, readers of `dst` see the full content
  *     (no torn/partial visibility).
  *   - On true, `tmp` is consumed (moved or deleted). On false, `tmp`
  *     is left in place — the CALLER owns loser cleanup.
  *   - `dst` already existing (from any process, any time) must lose.
  */
trait CommitArbiter {
  def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean
}

/** The filesystem-native arbiter (default): hard-link-if-absent on
  * `file://` (POSIX link(2) fails EEXIST atomically — two processes
  * cannot both win), atomic rename elsewhere (HDFS rename-no-overwrite
  * semantics). Exactly the historical behavior.
  */
object FsCommitArbiter extends CommitArbiter {
  override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else f.rename(tmp, dst)
}

/** An arbiter for stores whose rename OVERWRITES (S3-class): mutual
  * exclusion comes from an external compare-and-swap — here a
  * process-wide conditional-put table, the single-writer-process
  * variant of the pattern (Delta's S3SingleDriverLogStore role); a
  * multi-process deployment supplies a [[Coordinator]] backed by a
  * real conditional-put service (DynamoDB role) and everything else
  * is unchanged. Only the CAS winner touches `dst`, so the store's
  * non-atomic overwrite-capable rename becomes safe: losers never
  * issue it.
  */
class CoordinatedCommitArbiter(
    coordinator: CoordinatedCommitArbiter.Coordinator =
      CoordinatedCommitArbiter.processWide)
  extends CommitArbiter {
  /** The store's (possibly overwrite-capable, non-atomic) install —
    * only ever issued by the sole CAS claimant. Overridable so specs
    * can fake a store whose rename overwrites silently and prove the
    * exclusion comes from the coordinator, not the store. REQUIRED
    * semantics relied on below: by the time this call has RETURNED or
    * THROWN, the store will not land `dst` later on its own — a
    * synchronous rename/PUT whose every attempt reported failure does
    * not spontaneously apply afterwards (the same synchronous-store
    * assumption Delta's S3 LogStores document; an install wrapping an
    * async client must await its completion before returning).
    */
  protected def install(f: FileSystem, tmp: Path, dst: Path): Boolean =
    f.rename(tmp, dst)

  override def putIfAbsent(f: FileSystem, tmp: Path, dst: Path): Boolean = {
    val key = f.makeQualified(dst).toUri.toString
    // recovery: a dst that already exists (prior process, replayed
    // producer) must lose even if this coordinator has no claim for it
    if (f.exists(dst)) return false
    val token = coordinator.claim(key) match {
      case Some(t) => t
      case None => return false
    }
    // sole claimant: the store's non-atomic install is now ours alone.
    // Whatever the install REPORTS, dst's actual state decides (an
    // S3-class rename is copy+delete: the copy can land dst and the
    // call still throw or report false — trusting the report would
    // either lose a commit that is already visible, or wedge a version
    // that never landed). The probe is sound because we hold the sole
    // claim and dst was verified absent before it: dst existing now
    // means OUR install created it, with full content (install
    // visibility is atomic per the contract above).
    val installed =
      try install(f, tmp, dst)
      catch {
        case e: Throwable =>
          if (f.exists(dst)) {
            // the install landed before failing its response: this IS
            // our commit — report success and consume tmp (rename may
            // have died between its copy and its delete)
            f.delete(tmp, false)
            return true
          }
          // dst verifiably absent: release so the version stays
          // committable (a retry or another writer lands it without
          // waiting out a lease); the claim must not outlive an
          // install that demonstrably never happened (ADVICE r14)
          coordinator.release(key, token)
          throw e
      }
    if (installed) return true
    if (f.exists(dst)) {
      // returned false but dst landed (copy+delete store reporting the
      // delete leg's failure): our content is the visible commit —
      // releasing here would let a retry OVERWRITE it (ADVICE r14)
      f.delete(tmp, false)
      return true
    }
    // a false return with dst absent: the store refused before acting,
    // so the claim is safe to relinquish — without this, every later
    // publish of the same dst in this process loses while dst stays
    // absent, and [[Snapshots.commit]] re-resolves the same version
    // and conflicts forever (ADVICE r13)
    coordinator.release(key, token)
    false
  }
}

object CoordinatedCommitArbiter {
  /** The conditional-put service seam (DynamoDB put-if-absent, ZK
    * create, DB unique insert): `claim(key)` grants at most one LIVE
    * claim per key at a time, returning a FENCING TOKEN unique to this
    * grant — a claim outlives its holder only until the coordinator's
    * lease on it expires, after which a later claimant may take it
    * over (it re-verifies dst is absent before claiming, so a takeover
    * can never double-commit a version whose install actually landed).
    * `release(key, token)` relinquishes a claim whose install
    * verifiably NEVER HAPPENED (returned false / threw with dst
    * absent) and is a no-op unless `token` is the claim's CURRENT
    * grant — a stale holder (expired and taken over) cannot evict the
    * new one, and token uniqueness makes that hold even across
    * recycled threads or claim/release interleavings (JVM thread ids
    * are reused; a per-grant token is not — ADVICE r14).
    */
  trait Coordinator {
    /** Some(fencing token) iff this call acquired the claim. */
    def claim(key: String): Option[Long]
    def release(key: String, token: Long): Unit
  }

  /** Process-wide claims — correct for a single writer process.
    * Successful claims are held for the process lifetime (~64 B per
    * commit attempted): releasing a claim after a SUCCESSFUL install
    * would re-open the check-then-act window for a racer that passed
    * the existence check before the install landed, and within one
    * process there is no crashed-claimant liveness hole to age out.
    * `release` only ever fires for installs that verifiably never
    * created dst, where re-granting is safe. Multi-process deployments
    * that need crash recovery use [[leased]] (or a real external
    * coordinator with the equivalent TTL).
    */
  val processWide: Coordinator = new Coordinator {
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

  /** A lease-aging coordinator — the crash-recovery contract a real
    * conditional-put service provides (DynamoDB TTL'd items, ZK
    * ephemeral nodes): a claim expires `ttlMs` after it was granted,
    * so a claimant that dies between `claim` and `install` cannot
    * wedge its version forever — a later writer's claim TAKES OVER the
    * expired entry (atomically, single compute per key) after its own
    * verified-absent-dst check. Release is guarded by the per-grant
    * fencing token: a claimant whose lease already expired and was
    * taken over cannot evict the new holder. `clock` is injectable so
    * specs drive expiry deterministically. SAFETY ASSUMPTION (document
    * of every lease-based arbiter, not special to this one): `ttlMs`
    * must exceed the slowest install + clock skew — a claimant still
    * running past its lease races the takeover, which only an
    * install-side fencing check could close.
    */
  def leased(ttlMs: Long,
             clock: () => Long = () => System.currentTimeMillis()): Coordinator =
    new Coordinator {
      private val seq = new java.util.concurrent.atomic.AtomicLong()
      // key -> (lease deadline, fencing token of the current grant)
      private val claims =
        new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
      override def claim(key: String): Option[Long] = {
        val now = clock()
        var won: Option[Long] = None
        claims.compute(key, (_, cur) =>
          if (cur == null || cur._1 <= now) {
            val t = seq.incrementAndGet(); won = Some(t); (now + ttlMs, t)
          } else cur)
        won
      }
      override def release(key: String, token: Long): Unit =
        claims.computeIfPresent(key, (_, cur) =>
          if (cur._2 == token) null else cur)
    }
}

/** Arbiter registry: per-path-prefix registration (longest prefix
  * wins), defaulting to [[FsCommitArbiter]]. Registration is explicit
  * — a deployment wires its store's arbiter once for its warehouse
  * root; tests wire fakes for their temp tables without touching
  * anyone else's.
  */
object CommitArbiters {
  private val byPrefix =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()

  /** Route commits under `pathPrefix` through `arbiter`. */
  def register(pathPrefix: String, arbiter: CommitArbiter): Unit =
    byPrefix.put(pathPrefix, arbiter)

  def unregister(pathPrefix: String): Unit = byPrefix.remove(pathPrefix)

  def forPath(dst: Path): CommitArbiter = {
    val s = dst.toString
    var best: String = null
    val it = byPrefix.keys()
    while (it.hasMoreElements) {
      val p = it.nextElement()
      // path-SEGMENT boundary, not a raw string prefix: a registration
      // for /wh/t1 must not capture /wh/t10's commits
      val matches = s == p ||
        s.startsWith(if (p.endsWith("/")) p else p + "/")
      if (matches && (best == null || p.length > best.length))
        best = p
    }
    if (best == null) FsCommitArbiter else byPrefix.get(best)
  }
}
