package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized incremental aggregate views over [[Snapshots]] tables
  * — the formalization of the maintenance pattern the u5/u19 demos
  * established by hand: a distributive GROUP-BY aggregate (COUNT +
  * SUMs) kept equal to "aggregate of the source's latest snapshot"
  * by folding SIGNED change-feed partials into the stored state, so
  * each refresh costs O(changed data + view), never O(source table).
  *
  * The reference has no incremental story at all — its marts are full
  * recomputes per run (`dbt_project/models/marts/fct_requests_hourly
  * .sql`, rebuilt by every `dbt run`, see `orchestration/flow.py:33`).
  * At 100 TB a nightly full recompute of a fact table is the single
  * largest wasted job in the warehouse; this layer is the replacement:
  * the view absorbs appends, row-level DELETEs (deletion vectors) and
  * merge-on-read MERGEs through one code path, because
  * [[Snapshots.readChangeFeed]] presents them all as net
  * insert/delete rows.
  *
  * Design choices, deliberately minimal:
  *   - The VIEW IS ITSELF A SNAPSHOT TABLE. Refreshes are atomic CAS
  *     commits, the view time-travels like any table, and concurrent
  *     refreshers resolve to one winner (the loser re-reads the new
  *     watermark and retries a smaller slice).
  *   - The refresh watermark (last folded source version) rides the
  *     view manifest's per-producer txn map — the same replay
  *     machinery the exactly-once sinks use, so a replayed refresh
  *     no-ops by construction and table maintenance on the view
  *     (compaction) can never lose it.
  *   - The view definition stays in code (caller passes the same
  *     [[ViewDef]] to bootstrap and refresh) — state is data, the
  *     query is source. SUM columns are maintained as
  *     DECIMAL-cast partials (exact, order-insensitive), the repo's
  *     cross-engine determinism rule; AVG derives as sum/count at
  *     serve time rather than being stored (it is not distributive).
  *
  * Scale shape of one refresh: one manifest diff (driver, O(1)), one
  * change-feed scan of the added files + dv-matched slice, one
  * aggregation of that slice, one union+re-aggregate with the stored
  * view (O(view) — group counts, not source rows), one commit. A
  * 1000-executor cluster refreshing a 100 TB source with a 100 GB day
  * touches the 100 GB.
  */
object IncrementalViews {

  /** txn appId under which the view's refresh watermark (= highest
    * source version folded in) is recorded in the VIEW's manifests.
    */
  val ViewTxnApp = "graft-view-refresh"

  /** A distributive aggregate view: GROUP BY `keys`, COUNT(*) as
    * `n_rows`, and SUM(CAST(col AS DECIMAL(18,2))) AS alias for each
    * (col, alias) in `sums`. Exactly the shape whose partials merge
    * by re-aggregation in both directions (+insert / −delete).
    *
    * `maxs`/`mins` extend the view with MAX/MIN columns for
    * APPEND-ONLY sources: max/min absorb inserts by re-aggregation
    * but are NOT invertible under deletes (the departing row might
    * have been the extremum — recomputing it needs the group's other
    * rows). A refresh whose slice carries deletes therefore REFUSES a
    * min/max view (or re-bootstraps with `rebootstrapOnRewrite`) —
    * the honest contract, not a silently-stale extremum.
    */
  final case class ViewDef(keys: Seq[String], sums: Seq[(String, String)],
                           maxs: Seq[(String, String)] = Nil,
                           mins: Seq[(String, String)] = Nil) {
    require(keys.nonEmpty, "a view needs at least one grouping key")
    require(keys.distinct.size == keys.size, "view keys must be distinct")
    private val aliases = sums.map(_._2) ++ maxs.map(_._2) ++ mins.map(_._2)
    require(aliases.distinct.size == aliases.size &&
        !aliases.contains("n_rows") && !aliases.exists(keys.contains),
      "view aliases must be distinct and collide with neither n_rows nor a key")
    private[IncrementalViews] def hasExtrema: Boolean =
      maxs.nonEmpty || mins.nonEmpty
  }

  private def sumCast(c: String): Column = col(c).cast("decimal(18,2)")

  /** The view's content computed directly from `df` — the bootstrap
    * aggregate, and (over the source's latest snapshot) the oracle
    * every refreshed state must equal. Sum columns normalized to
    * DECIMAL(38,2) so bootstrap and refreshed states carry the same
    * schema (Spark widens sum-of-decimal precision; 38 is the cap).
    */
  /** keys, n_rows, normalized sums, then extrema — the one column
    * order every state/partial frame uses.
    */
  private def viewColumns(vd: ViewDef) =
    vd.keys.map(col) ++ Seq(col("n_rows")) ++
      vd.sums.map { case (_, a) => col(a).cast("decimal(38,2)").as(a) } ++
      (vd.maxs ++ vd.mins).map { case (_, a) => col(a) }

  def aggregate(df: DataFrame, vd: ViewDef): DataFrame =
    df.groupBy(vd.keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        vd.sums.map { case (c, a) => sum(sumCast(c)).as(a) } ++
          vd.maxs.map { case (c, a) => max(col(c)).as(a) } ++
          vd.mins.map { case (c, a) => min(col(c)).as(a) }: _*)
      .select(viewColumns(vd): _*)

  /** Signed partials of one change-feed slice: insert rows contribute
    * (+1, +value), delete rows (−1, −value). A MERGE's update arrives
    * as delete(old)+insert(new), so updates need no special case.
    * Extrema partials take inserts only — [[refresh]] refuses a
    * deleting slice for min/max views before this runs.
    */
  private def signedPartials(feed: DataFrame, vd: ViewDef): DataFrame = {
    val ins = col("_change_type") === "insert"
    val sign = when(ins, 1L).otherwise(-1L)
    feed.groupBy(vd.keys.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        vd.sums.map { case (c, a) =>
          sum(when(ins, sumCast(c)).otherwise(-sumCast(c))).as(a)
        } ++
          vd.maxs.map { case (c, a) => max(when(ins, col(c))).as(a) } ++
          vd.mins.map { case (c, a) => min(when(ins, col(c))).as(a) }: _*)
      .select(viewColumns(vd): _*)
  }

  /** Fold partials into the stored state: union + re-aggregate (count
    * and decimal sum are distributive under signs; max/min under
    * inserts), dropping groups that net to zero rows — a fully-
    * deleted group disappears, which is exactly what the direct
    * aggregate of the final state shows.
    */
  private def merged(state: DataFrame, partials: DataFrame,
                     vd: ViewDef): DataFrame =
    state.unionByName(partials)
      .groupBy(vd.keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        vd.sums.map { case (_, a) => sum(col(a)).as(a) } ++
          vd.maxs.map { case (_, a) => max(col(a)).as(a) } ++
          vd.mins.map { case (_, a) => min(col(a)).as(a) }: _*)
      .filter(col("n_rows") > 0)
      .select(viewColumns(vd): _*)

  /** Materialize the view from the source's LATEST snapshot (one full
    * aggregation — the only O(source) step in the view's lifetime)
    * and record that version as the refresh watermark. Returns the
    * view's version (0 for a fresh viewDir).
    */
  def bootstrap(spark: SparkSession, sourceDir: String, viewDir: String,
                vd: ViewDef): Long = {
    // "latest" = last LIVE source version: an uncommitted/aborted
    // multi-table txn head must never become the view's watermark
    val srcV = Snapshots.latestLiveVersion(spark, sourceDir).getOrElse(
      throw new IllegalArgumentException(s"source $sourceDir has no versions"))
    Snapshots.commit(
      aggregate(Snapshots.readVersion(spark, sourceDir, Some(srcV)), vd),
      viewDir, "overwrite", txn = Some((ViewTxnApp, srcV)))
  }

  /** Highest source version folded into the view. */
  def refreshedVersion(spark: SparkSession, viewDir: String): Long = {
    val v = Snapshots.latestLiveVersion(spark, viewDir).getOrElse(
      throw new IllegalArgumentException(s"view $viewDir was never bootstrapped"))
    Snapshots.liveManifest(spark, viewDir, v).txns.getOrElse(ViewTxnApp,
      throw new IllegalArgumentException(
        s"view $viewDir carries no $ViewTxnApp watermark"))
  }

  /** Fold everything the source committed since the last refresh into
    * the view, as ONE atomic CAS commit carrying the new watermark.
    * A refresh with nothing new (replay, crash-retry) no-ops without
    * committing. Cost: O(changed data + view rows).
    *
    * A non-append source commit inside the range (compaction, purge,
    * overwrite, RESTORE) is not a row-level change set — the feed
    * read refuses it; with `rebootstrapOnRewrite` the refresh falls
    * back to [[bootstrap]] (explicit O(source) recompute) instead of
    * failing, the "restart the consumer from the rewrite" rule.
    * A concurrent refresher surfaces as the commit's
    * ConcurrentModificationException — re-call refresh: the new
    * watermark shrinks the slice to what is still unfolded.
    *
    * Returns the view's (possibly unchanged) latest version.
    */
  def refresh(spark: SparkSession, sourceDir: String, viewDir: String,
              vd: ViewDef, rebootstrapOnRewrite: Boolean = false): Long = {
    val viewV = Snapshots.latestLiveVersion(spark, viewDir).getOrElse(
      throw new IllegalArgumentException(s"view $viewDir was never bootstrapped"))
    val from = refreshedVersion(spark, viewDir)
    // fold up to the last LIVE source version: a concurrent in-flight
    // (or aborted) txn head is not table history — folding stops just
    // below it and the next refresh picks up whatever it decides into
    val to = Snapshots.latestLiveVersion(spark, sourceDir).getOrElse(
      throw new IllegalArgumentException(s"source $sourceDir has no versions"))
    if (to <= from) return viewV // nothing new: replay-safe no-op
    val state = Snapshots.readVersion(spark, viewDir, Some(viewV))
    // Decide feed availability STRUCTURALLY (manifest probes + set
    // diffs — O(1) driver work, no Spark jobs, no exception-message
    // matching): Left(reason) = the feed cannot replay this range —
    // a rewrite in range, a deleting slice against a min/max view, or
    // a watermark whose manifest is gone (vacuumed) / not live.
    val probe: Either[String, Option[(Set[String], Set[String])]] =
      try {
        val toM = Snapshots.liveManifest(spark, sourceDir, to)
        val fromM = Snapshots.liveManifest(spark, sourceDir, from)
        if (!fromM.files.toSet.subsetOf(toM.files.toSet) ||
            !fromM.dvs.toSet.subsetOf(toM.dvs.toSet))
          Left(s"non-append commit between v$from and v$to of $sourceDir")
        else if (toM.files.toSet == fromM.files.toSet &&
            toM.dvs.toSet == fromM.dvs.toSet)
          Right(None) // metadata-only range: nothing to fold
        else if (vd.hasExtrema &&
            toM.dvs.toSet.diff(fromM.dvs.toSet).nonEmpty)
          Left(s"slice v$from..v$to of $sourceDir deletes rows — a min/max " +
            "view cannot absorb deletes")
        else Right(Some((fromM.files.toSet, fromM.dvs.toSet)))
      } catch {
        // the probe reads only manifests: any refusal here (vacuumed
        // watermark, dead txn endpoint, unreadable manifest) IS feed
        // unavailability for this range
        case e: IllegalArgumentException => Left(e.getMessage)
      }
    val next = probe match {
      case Left(reason) if rebootstrapOnRewrite =>
        return bootstrap(spark, sourceDir, viewDir, vd)
      case Left(reason) =>
        throw new IllegalArgumentException(
          s"cannot refresh $viewDir: $reason — change feed unavailable; " +
            "rebootstrap to recompute")
      case Right(None) => state
      case Right(Some(_)) =>
        merged(state,
          signedPartials(Snapshots.readChangeFeed(spark, sourceDir, from, to), vd),
          vd)
    }
    Snapshots.commit(next, viewDir, "overwrite",
      expectedVersion = Some(viewV + 1), txn = Some((ViewTxnApp, to)))
  }

  /** Continuous maintenance: pair with [[Snapshots.streamChangeFeed]]
    * as `writeStream.foreachBatch(IncrementalViews.viewSink(src, view,
    * vd) _)` — every discovered source commit triggers one [[refresh]]
    * (a fresh view bootstraps on the first batch: initial-load-then-
    * tail). The file source's checkpoint carries discovery progress
    * and the view's OWN txn watermark carries fold progress, so a
    * replayed micro-batch (failure between refresh and checkpoint
    * write) no-ops and a racing refresher costs only a CAS retry —
    * exactly-once materialization with no bespoke state. The batch's
    * version rows are only a trigger: refresh always folds up to the
    * source's latest, and the batches that then arrive for already-
    * folded versions no-op on the watermark.
    */
  def viewSink(sourceDir: String, viewDir: String, vd: ViewDef,
               rebootstrapOnRewrite: Boolean = false)
              (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    var attempt = 0
    while (true) {
      try {
        // gate on the last LIVE view version — a dead txn head on the
        // view dir must route to bootstrap, not wedge refresh
        if (Snapshots.latestLiveVersion(spark, viewDir).isEmpty)
          bootstrap(spark, sourceDir, viewDir, vd)
        else refresh(spark, sourceDir, viewDir, vd, rebootstrapOnRewrite)
        return
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= 10) throw e
      }
    }
  }

  /** Demo + oracle entry (`u27_materialized_view`): a per-status
    * orders view maintained through the FULL change vocabulary —
    * bootstrap (v0), late append (v1), a deletion-vector DELETE of a
    * keyed ~9% slice (v2 — CDC-scale, not a third of the table; the
    * net-to-zero group case is IncrementalViewSpec's job), merge-on-
    * read MERGE (updates + inserts, v3) — with one refresh after each
    * commit plus a replayed refresh that must no-op
    * (`n_view_versions` pins it through the oracle). The served view
    * must equal the direct aggregate of the source's final state,
    * which is what the oracle replays relationally.
    */
  def u27MaterializedView(s: SparkSession, d: String): DataFrame = {
    val tableDir = DemoFixtures.clonedOrders(s, d, "graft-mview-src")
    val viewDir = graft.TempDirs.create("graft-mview")
    val vd = ViewDef(Seq("o_orderstatus"), Seq(("o_totalprice", "total")))
    val orders = graft.Tables.orders(s, d)
    bootstrap(s, tableDir, viewDir, vd)
    val late = orders.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
    Snapshots.commit(late, tableDir, "append")
    refresh(s, tableDir, viewDir, vd)
    Snapshots.deleteWhere(s, tableDir, col("o_orderkey") % 11 === 0)
    refresh(s, tableDir, viewDir, vd)
    // the masked read feeds BOTH change branches and the merge's own
    // re-evaluation — materialize it once, through the repo-wide
    // checkpoint policy switch (freed by the harnesses'
    // persistent-RDD sweep between queries)
    val visible =
      graft.operators.Checkpoints.persistFrame(Snapshots.readVersion(s, tableDir))
    val upd = visible.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("op", lit("U"))
    val ins = visible.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("op", lit("I"))
    Snapshots.mergeOnRead(s, tableDir, upd.unionByName(ins), "o_orderkey")
    refresh(s, tableDir, viewDir, vd)
    refresh(s, tableDir, viewDir, vd) // replay: must not commit
    val nViewVersions = Snapshots.latestVersion(s, viewDir).get + 1
    Snapshots.readVersion(s, viewDir)
      .select(col("o_orderstatus"), col("n_rows"),
        col("total").cast("double").as("total"))
      .withColumn("n_view_versions", lit(nViewVersions).cast("int"))
      .orderBy("o_orderstatus")
  }
}
