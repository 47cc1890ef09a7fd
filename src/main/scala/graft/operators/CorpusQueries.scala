package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage over the driver's TPC-H-ish corpus
  * (TESTDATA.md): scans with pushdown, hash aggregation, broadcast /
  * shuffle joins (inner, left, semi, anti, star), top-k, window
  * functions, set operations, rollup, JSON extraction, sessionization.
  *
  * Oracle-determinism rule used throughout: any SUM over a fractional
  * double column is computed over an exact DECIMAL cast and only cast
  * back to DOUBLE at the end. Double addition is not associative, so a
  * raw sum(double) differs between Spark's partial/final partition sums
  * and DuckDB's sequential sum in low-order bits; decimal sums are exact
  * and therefore bit-identical on both sides — and, at 100 TB, also
  * independent of the partition count. Integral-valued doubles
  * (l_quantity) are exact in IEEE754 and safe to sum directly.
  */
object CorpusQueries {

  /** Exact-decimal view of a monetary/fractional double column. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** sum(decimal) surfaced as a deterministic DOUBLE. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  private def revenueTerm: Column =
    dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** TPC-H Q1-style pricing summary: scan + filter + grouped multi-agg.
    * Filter is pushed into the parquet scan; aggregation is
    * partial+final hash agg (map-side combine) — no full-row shuffle.
    */
  def q1LineitemAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        sum(revenueTerm).cast("double").as("sum_disc"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Projection + selective filter — exercises parquet predicate pushdown
    * and column pruning (ReadSchema should list only the 4 columns).
    */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate").between(
          lit("1998-01-01 00:00:00").cast("timestamp"),
          lit("1998-12-31 23:59:59").cast("timestamp")) &&
        col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Inner join orders ⋈ customer with the dim side broadcast — no
    * shuffle of the fact at any scale where the dim fits in memory.
    */
  def q3JoinInner(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")

  /** Left outer join keeping customers with zero orders (count = 0). */
  def q4JoinLeft(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** Left-semi join: customers having at least one finished order. */
  def q5JoinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join: customers with no orders at all. */
  def q6JoinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Star-schema join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    * revenue rolled up by region/nation. Dims are broadcast; the only
    * shuffle joins are fact-to-fact (lineitem⋈orders), which co-partition
    * on the join key.
    */
  def q7StarJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(revenueTerm).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  /** Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    * (per-partition heap + driver merge, no full sort).
    */
  def q8TopK(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(revenueTerm).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("o_custkey"))
      .limit(10)

  /** row_number window: top-2 orders per customer by price. */
  def q9WindowRowNumber(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** lag window over the daily revenue series: day-over-day delta.
    * The unpartitioned window (global date order) runs on the
    * POST-AGGREGATION series — one row per calendar day, bounded input
    * regardless of raw scale — so the single-partition WindowExec is
    * inherent to the semantics, not a scale hazard. (q11 shows the
    * partitioned form.)
    */
  def q10WindowLag(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy("order_date")
    daily
      .withColumn("prev_dec", lag("rev_dec", 1).over(w))
      .select(
        col("order_date"),
        col("rev_dec").cast("double").as("revenue"),
        col("prev_dec").cast("double").as("prev_revenue"),
        (col("rev_dec") - col("prev_dec")).cast("double").as("delta"))
      .orderBy("order_date")
  }

  /** Running (cumulative) revenue per order priority. The running sum is
    * kept in DECIMAL so it is exact — associativity-independent — and
    * only cast to DOUBLE for output.
    */
  def q11WindowRunning(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
    val w = Window.partitionBy("o_orderpriority").orderBy("order_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select(
        col("o_orderpriority"), col("order_date"),
        col("rev_dec").cast("double").as("revenue"),
        sum(col("rev_dec")).over(w).cast("double").as("running_revenue"))
      .orderBy("o_orderpriority", "order_date")
  }

  /** UNION (distinct) of customer keys from two order-status slices. */
  def q12Union(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .union(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .distinct()
      .orderBy("o_custkey")
  }

  /** INTERSECT of customer keys between two order-status slices. */
  def q13Intersect(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** EXCEPT: customers with 'O' orders but no 'F' orders. */
  def q14Except(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** ROLLUP over (region, nation) with explicit grouping flags — via the
    * SQL surface: the DataFrame rollup+grouping() combination trips
    * Spark's ambiguous-attribute analyzer check, and GROUP BY ROLLUP is
    * the idiomatic SQL form anyway (plans identically: Expand + hash agg).
    */
  def q15Rollup(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("v_customer")
    Tables.nation(s, d).createOrReplaceTempView("v_nation")
    Tables.region(s, d).createOrReplaceTempView("v_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
        |  CAST(grouping(r_name) AS INT) AS g_region,
        |  CAST(grouping(n_name) AS INT) AS g_nation
        |FROM v_customer
        |JOIN v_nation ON c_nationkey = n_nationkey
        |JOIN v_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** Exact multi-column distinct counts per group. */
  def q16DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))
      .orderBy("l_returnflag")

  /** JSON extraction over events.props ({"k": <int>}) — native
    * get_json_object, no UDF; integer sums are exact.
    */
  def q17EventsJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Tumbling-hour aggregation of the event stream (batch twin of the
    * Structured Streaming hourly window; hour surfaced as a string so
    * the timestamp physical unit (µs vs ns) cannot skew the compare).
    */
  def q18EventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  /** GROUPING SETS with mixed grains (status×priority, status, grand
    * total) — one Expand + single hash aggregation, not three scans.
    */
  def q20GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
        |FROM v_orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Approximate distinct-count sketch (HyperLogLog++) next to the exact
    * count — the 100 TB path where exact distinct is a full shuffle of
    * the key domain but the sketch is mergeable, constant-size state.
    * The raw estimate is engine-specific (no cross-engine oracle can
    * pin it), so the output carries a BOUNDED-ERROR WITNESS instead:
    * `within_rsd` asserts |estimate - exact| <= 5·rsd·exact — with the
    * requested rsd of 0.02 that is a ±10% (5-sigma) envelope the HLL++
    * accuracy guarantee (rsd ≈ 1.04/√(2^p)) makes all-but-certain, and
    * Spark's sketch is deterministic for a fixed input so the column
    * is a stable 1 the DuckDB oracle CAN verify next to the exact
    * count. The estimate itself stays out of the compared output.
    */
  def qxApproxDistinct(s: SparkSession, d: String): DataFrame =
    // One distinct projection feeds BOTH halves: HLL++ is
    // duplicate-insensitive (same deterministic hash set either way),
    // and over distinct pairs the exact distinct is a plain count(*).
    // Mixing countDistinct with approx_count_distinct in one Aggregate
    // would make Catalyst Expand-duplicate every scanned row — twice
    // the shuffle volume for identical output (plan-asserted in
    // CorpusSpec: no Expand node).
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__approx"))
      .withColumn("within_rsd",
        when(abs(col("__approx") - col("exact_parts"))
          <= lit(5 * 0.02) * col("exact_parts").cast("double"), 1).otherwise(0))
      .select(col("l_returnflag"), col("exact_parts"), col("within_rsd"))
      .orderBy("l_returnflag")

  /** Bloom-pruned fact-dim join: lineitems of URGENT orders. The fact
    * side is cut by [[BloomPrune]] (8 KB sketch of the urgent
    * orderkeys, map-side membership test — no shuffle to prune) before
    * the exact join clears the bloom's false positives. Result is
    * identical to the plain join (the oracle IS the plain SQL); the
    * point is what reaches the join at 100 TB.
    */
  def q32BloomJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.prefilter(
      Tables.lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Native session windows in batch mode: Spark's `session_window`
    * (the same construct the streaming sessionizer uses) over per-user
    * event streams, 30-minute gap. One shuffle on user_id, then the
    * in-partition merge — no self-join, no window-function cascade.
    * Boundary semantics pinned by the oracle: a session spans
    * [first ts, last ts + gap), and an event arriving EXACTLY at the
    * current end starts a new session (gap ≥ 30 min closes — note
    * q19's manual formulation closes only on strict >; the two agree
    * everywhere except exact-boundary ties, which µs timestamps make
    * measure-zero). event_id_sum pins session membership under the
    * hash compare, not just the count.
    */
  def q33SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("event_id").as("event_id_sum"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("event_id_sum"))
      .orderBy("user_id", "session_start")

  /** Hourly anomaly detection over the error-event series: flag hours
    * whose error count deviates from their day's mean by more than 2σ
    * — the monitoring query a log pipeline serves from its hourly
    * rollup. All statistics derive from EXACT integer sums (count,
    * Σcnt, Σcnt² as BIGINT, partial-aggregated), and mean/variance are
    * computed with the identical expression shape in the oracle, so
    * every double is the same one IEEE result in both engines — no
    * stddev_samp/sqrt built-in whose internal summation order could
    * differ. The 2σ test compares (cnt − mean)² > 4·var, avoiding
    * sqrt entirely. The day-window partitions carry ≤24 rows each at
    * any raw data scale — the window is over the ROLLUP, not events.
    */
  def q34Anomaly(s: SparkSession, d: String): DataFrame = {
    val wDay = Window.partitionBy("day")
    Tables.events(s, d)
      .filter(col("event_type") === "error")
      .groupBy(
        to_date(col("ts")).as("day"),
        date_format(col("ts"), "HH").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_hours", count(lit(1)).over(wDay))
      .withColumn("day_sum", sum("n_events").over(wDay))
      .withColumn("day_sumsq", sum(col("n_events") * col("n_events")).over(wDay))
      .withColumn("day_mean", col("day_sum") / col("day_hours"))
      .withColumn("day_var",
        (col("day_sumsq") - col("day_sum") * col("day_sum") / col("day_hours"))
          / col("day_hours"))
      .withColumn("is_anomaly",
        (col("n_events") - col("day_mean")) * (col("n_events") - col("day_mean"))
          > lit(4.0) * col("day_var"))
      .select("day", "hour", "n_events", "day_mean", "day_var", "is_anomaly")
      .orderBy("day", "hour")
  }

  /** Exact companion to [[qxApproxDistinct]]: the same grouping with
    * only the exact distinct count — oracle-checkable (the HLL estimate
    * is not), so the approx-distinct family has a hash-verified row.
    */
  def qx1aDistinctExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** Mergeable-sketch rollup — the re-aggregatable distinct-count
    * architecture at 100 TB: per-day Datasketches HLL partials are
    * built ONCE over raw events (constant-size state per group,
    * map-side mergeable), and every coarser grain is served by
    * UNIONING sketches — no rescan of raw data. x1 shows the estimate;
    * this query pins the property the whole architecture rests on,
    * in-engine, as oracle-checkable invariants next to exact counts:
    *
    *   - per day: `sketch_consistent` = the cumulative-union estimate
    *     (sketches of days ≤ D merged) is non-decreasing in D — HLL
    *     union only raises registers, so a dip would mean the merge
    *     path is broken;
    *   - total row: the merged-daily-sketches estimate EQUALS the
    *     estimate of one sketch built directly over all events (HLL
    *     union at equal lgK is lossless) — the store-partials-serve-
    *     merged design gives up nothing vs a full rescan.
    *
    * Exact columns (per-day distinct, cumulative distinct via
    * first-seen-day) are DuckDB-checked; estimates themselves stay
    * out of the output (engine-specific, x1's caveat). The cumulative
    * window is a single partition BY DESIGN: it runs over the per-day
    * aggregate (|days| rows), not over events.
    */
  /** Mergeable quantile sketch (x3): a fixed-geometry histogram —
    * 256 bins of width 512 over [0, 131072), covering l_extendedprice
    * with slack — whose partials ADD, so per-(flag, linestatus)
    * sketches roll up to per-flag by plain re-aggregation; quantiles
    * are then read off the merged histogram by cumulative-count
    * search with linear interpolation inside the target bin. This is
    * the approximate-percentile shape a 100 TB engine actually serves
    * rollups from: O(groups × 256) state, one narrow shuffle, any
    * rollup grain answerable WITHOUT rescanning rows (the GK/KLL
    * sketches behind percentile_approx are mergeable too, but their
    * estimates are compaction-order-dependent — this one is exactly
    * deterministic, so the oracle replays the whole computation
    * relationally instead of settling for a rows-only check).
    * Accuracy contract: the estimate and the true quantile lie within
    * one bin of each other — |est − exact| ≤ 2·512 (QuantileSketchSpec
    * pins it against the exact interpolated percentile, plus partial/
    * merge invariance over a random corpus split). The oracle-passed
    * equality of Spark's two-level merge (flag×linestatus → flag)
    * with DuckDB's direct one-level build IS the mergeability proof.
    * Bin width a power of two: x/512 and ·512 are exact in binary
    * floating point, so bin ids can never straddle engines; the
    * interpolation arithmetic is all-double (IEEE-identical).
    */
  def x3QuantileSketch(s: SparkSession, d: String): DataFrame = {
    val binW = 512.0
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"))
    // level 0: the partial sketches (one histogram per flag×linestatus)
    val partials = li
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        least(floor(col("l_extendedprice") / lit(binW)), lit(255L))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    // sketch MERGE = adding bin counts (the rollup to per-flag)
    val mergedH = partials.groupBy("l_returnflag", "bin")
      .agg(sum("cnt").as("cnt"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    val h = mergedH
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
    // quantile read-off: the first bin whose cumulative count reaches
    // q·n, linearly interpolated within the bin; each flag matches
    // exactly one bin per q, extracted by a conditional aggregate
    def est(q: Double): Column = {
      val t = lit(q) * col("n")
      val before = col("cum") - col("cnt")
      max(when(before < t && col("cum") >= t,
        (col("bin") + (t - before) / col("cnt")) * lit(binW)))
    }
    h.groupBy("l_returnflag")
      .agg(max(col("n")).as("n_rows"),
        est(0.5).as("est_p50"), est(0.95).as("est_p95"))
      .orderBy("l_returnflag")
  }

  /** Heavy hitters with a count-min sketch (x4) — the last member of
    * the sketch family (x1/x2 distinct-HLL, x3 quantile histogram):
    * a 3×1024 CMS over event users, built in ONE aggregation pass
    * (explode the 3 salted `pmod(xxhash64(j, key), 1024)` bins, map-
    * side partial count → ≤3072 cells regardless of corpus size —
    * the mergeable fixed-size state a 100 TB stream keeps per window).
    * Estimates are hash-dependent (cross-engine non-replayable — x1's
    * caveat), so the compared output follows the x1 witness pattern:
    * the EXACT top-5 users (tie-broken by id; oracle-checkable) each
    * carry `cms_ge_exact` = estimate ≥ exact count, which the CMS
    * one-sided error guarantee makes deterministically 1 — the
    * estimate itself stays out of the hash. The sketch build, the
    * probe join, and the witness all run in-engine.
    */
  def x4HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val (w, dRows) = (1024L, 3)
    val ev = Tables.events(s, d).select(col("user_id"))
    val bins = array((0 until dRows).map(j =>
      pmod(xxhash64(lit(j), col("user_id")), lit(w))): _*)
    // ONE pass: 3 salted cells per row, partial-agg'd to ≤3·w cells
    val cms = ev
      .select(posexplode(bins).as(Seq("j", "bin")))
      .groupBy("j", "bin").agg(count(lit(1)).as("cnt"))
    // distributed top-k (TakeOrderedAndProject) first; the global
    // row_number window then runs over FIVE rows, not all users
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id")).limit(5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_events").desc, col("user_id"))))
    // probe: the 5 keys × 3 bins against the sketch; estimate = min
    val probes = top
      .select(col("rank"), col("user_id"), col("n_events"),
        posexplode(bins).as(Seq("j", "bin")))
    probes.join(cms, Seq("j", "bin"), "left")
      .groupBy("rank", "user_id", "n_events")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("rank"), col("user_id"), col("n_events"),
        when(col("est") >= col("n_events"), 1).otherwise(0)
          .as("cms_ge_exact"))
      .orderBy("rank")
  }

  def x2SketchRollup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day").agg(
      expr("hll_sketch_agg(user_id, 14)").as("sk"),
      countDistinct("user_id").as("exact_users"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy("day")
    val perDay = daily.join(firstSeen, Seq("day"), "left")
      .withColumn("cum_exact_users",
        sum(coalesce(col("n_new"), lit(0L))).over(wCum))
      .withColumn("cum_sk", expr("hll_union_agg(sk)").over(wCum))
      .withColumn("cum_est", expr("hll_sketch_estimate(cum_sk)"))
      .withColumn("sketch_consistent",
        when(col("cum_est") >= coalesce(lag(col("cum_est"), 1).over(wLag),
          lit(Long.MinValue)), 1).otherwise(0))
      .select(concat(lit("day:"), col("day").cast("string")).as("scope"),
        col("exact_users"), col("cum_exact_users"), col("sketch_consistent"))
    val total = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_est"))
      .crossJoin(ev.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("direct_est"),
        countDistinct("user_id").as("exact_users")))
      .select(lit("total").as("scope"), col("exact_users"),
        col("exact_users").as("cum_exact_users"),
        when(col("merged_est") === col("direct_est"), 1).otherwise(0)
          .as("sketch_consistent"))
    perDay.unionByName(total).orderBy("scope")
  }

  /** CUBE over (status, priority): all four grains in one Expand +
    * hash aggregation (SQL surface for grouping(), as in q15Rollup).
    */
  def q21Cube(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders_cube")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority
        |FROM v_orders_cube
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Pivot: daily event counts spread across one column per event type
    * (explicit value list, so the plan is a single pass — no distinct-
    * values pre-query — and the output schema is stable at any scale).
    * Absent (day, type) combinations surface as 0, matching the
    * oracle's FILTER-ed counts.
    */
  def q22Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "error")
    val p = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("day")
  }

  /** Per-group top-k via the typed TopKAggregator (map-side partial
    * top-k: each task shuffles at most k rows per group instead of the
    * whole group — see TopKAggregator scaladoc). Pre-aggregated to
    * (flag, supplier) totals first, then the aggregator keeps the top 3
    * suppliers per return flag. Deterministic: score is an exact
    * integral-double sum; ties break on the smaller supplier key.
    */
  def q24TopKAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val pre = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
      .select(col("l_returnflag").as("flag"),
        col("l_suppkey").cast("long").as("id"), col("qty"))
      .as[(String, Long, Double)]
    pre
      .groupByKey(_._1)
      .mapValues { case (_, id, qty) => Scored(qty, id) }
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .toDF("l_returnflag", "top")
      .select(col("l_returnflag"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(
        col("l_returnflag"),
        (col("pos") + 1).cast("int").as("rank"),
        col("sc.id").as("l_suppkey"),
        col("sc.score").as("qty"))
      .orderBy("l_returnflag", "rank")
  }

  /** Two-path salted skew join (SkewJoin.saltedJoinHotKeys): the fact
    * side's key distribution is profiled first, ONLY keys above the
    * hot-share threshold get salted (spread across 8 salt buckets,
    * with only the hot slice of the dim replicated 8×); the cold
    * majority takes the plain keyed join. On TPC-H l_orderkey no key
    * exceeds the threshold (≤7 lines per order), so this correctly
    * degenerates to the plain join — the profile's verdict, not a
    * hand-tuned special case. Result is IDENTICAL to the plain join
    * either way (salting only changes the shuffle layout), which is
    * exactly what the oracle checks; the hot path itself is exercised
    * on synthetic skew in SkewJoinSpec.
    */
  def q25SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    SkewJoin.saltedJoinHotKeys(
        Tables.lineitem(s, d), dim, "l_orderkey",
        discriminator = col("l_linenumber"), salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
      .orderBy("o_orderpriority")
  }

  /** The zero-code alternative to q25's manual salting: the same
    * workload as a sort-merge join under AQE, whose skew-join rule
    * splits oversized shuffle partitions at runtime
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default). The merge
    * hint pins the join shape AQE's skew split applies to (a broadcast
    * join has no shuffle partitions to split); no salting, no dim
    * replication, no code. SkewJoinSpec forces the split on synthetic
    * skew with lowered thresholds and asserts `isSkewJoin` in the
    * final adaptive plan. Oracle = the plain join, same as q25.
    */
  def q40AqeSkew(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Tables.lineitem(s, d).hint("merge")
      .join(dim, Seq("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
      .orderBy("o_orderpriority")
  }

  /** Scalar subquery: rows above the GLOBAL average — the subquery
    * computes once (SubqueryExec, broadcast as a literal), not per row.
    */
  def q26ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem_sq")
    s.sql(
      """SELECT l_returnflag, COUNT(*) AS n_above,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty
        |FROM v_lineitem_sq
        |WHERE l_quantity > (SELECT AVG(l_quantity) FROM v_lineitem_sq)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** RANGE-frame window: 7-day moving revenue average. The frame is a
    * VALUE range over a day number (rangeBetween needs a numeric sort
    * key), so sparse dates still average over the true 7-day span —
    * a rows-frame would silently average "last 7 rows" instead.
    */
  def q27WindowRange(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
      .withColumn("day_no", datediff(col("order_date"), lit("1992-01-01").cast("date")))
    val w = Window.orderBy("day_no").rangeBetween(-6, 0)
    daily
      .select(
        col("order_date"),
        col("rev_dec").cast("double").as("revenue"),
        // exact decimal sum / exact count → deterministic double
        (sum(col("rev_dec")).over(w).cast("double") /
          count(lit(1)).over(w)).as("ma7_revenue"))
      .orderBy("order_date")
  }

  /** Correlated scalar subquery (Catalyst decorrelates it into a join):
    * orders priced above their own status-group's average. The
    * comparison is cross-multiplied (price·count > sum) in exact
    * DECIMAL so no engine-specific AVG rounding can flip boundary rows.
    */
  def q29CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("v_orders_corr")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_above
        |FROM v_orders_corr o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM v_orders_corr i
        |       WHERE i.o_orderstatus = o.o_orderstatus) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM v_orders_corr i
        |       WHERE i.o_orderstatus = o.o_orderstatus)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** NTILE quartiles of customers by account balance (tie-break on the
    * key so bucket membership is deterministic), rolled up per bucket.
    */
  def q28Ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("quartile")
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("acctbal_sum"),
        min("c_custkey").as("min_key"),
        max("c_custkey").as("max_key"))
      .orderBy("quartile")
  }

  /** Sessionization: a session breaks after a >30-minute gap per user.
    * Two windows (lag for gap detection, running sum for session ids) —
    * the standard scalable formulation, one shuffle on user_id.
    */
  def q19Sessions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum("is_new").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("session_events"))
      .groupBy("user_id")
      .agg(
        max("session_id").as("n_sessions"),
        max("session_events").as("max_session_events"),
        sum("session_events").as("n_events"))
      .orderBy("user_id")
  }

  /** FULL OUTER join: high-balance customers ⟗ per-customer counts of
    * pending orders — each side keeps rows the other lacks (customer
    * with no pending orders / pending order whose customer is below
    * the balance cut). Nullable columns from BOTH sides surface
    * unmatched rows, the outer-join semantics the oracle pins down.
    * Shuffle-hash/sort-merge on the key; no broadcast (Spark cannot
    * broadcast the stream side of a full outer join).
    */
  def q30JoinFull(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val pend = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "P" && col("o_totalprice") > 250000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pending"))
    cust.join(pend, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("n_pending"))
      .orderBy("custkey")
  }

  /** Ranking-function family in one window: per-nation customer
    * balance leaderboard with dense_rank (selection), percent_rank
    * (exact (rank-1)/(n-1) small-int division — deterministic IEEE),
    * and first_value (the nation's top customer carried onto every
    * row). The full ordering includes the key, so every rank is
    * total-order deterministic; groups are nation-sized — no skew.
    */
  def q31RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .select(
        col("c_nationkey"), col("c_custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        dense_rank().over(w).cast("int").as("pos"),
        percent_rank().over(w).as("pct"),
        first_value(col("c_custkey")).over(w).as("top_custkey"))
      .filter(col("pos") <= 2)
      .orderBy("c_nationkey", "pos", "c_custkey")
  }

  /** Completes the window-function surface next to q9/q10/q11/q27/q28/
    * q31: lead (forward peek), cume_dist (exact m/n rational — integer
    * division both engines, bit-identical), and the full-frame
    * navigation pair last_value / nth_value, which REQUIRE the
    * unbounded-following frame (the default running frame silently
    * returns the current row — the classic window bug, pinned here).
    */
  def q41WindowFamily2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(asc("c_acctbal"), asc("c_custkey"))
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, d)
      .select(
        col("c_nationkey"), col("c_custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        lead(col("c_custkey"), 1).over(w).as("next_custkey"),
        cume_dist().over(w).as("cdist"),
        last_value(col("c_custkey")).over(wFull).as("richest_custkey"),
        nth_value(col("c_custkey"), 2).over(wFull).as("second_custkey"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Ordered string aggregation (LISTAGG / string_agg): the reporting
    * op that turns a ranked group into one delimited string. Spark's
    * collect_list is ORDER-NONDETERMINISTIC by contract (partial-agg
    * arrival order), so the deterministic form pins the order
    * structurally: collect (rank, value) structs, array_sort (structs
    * sort lexicographically, rank first), then project+join — same
    * result on any partitioning, matching the oracle's
    * `string_agg(... ORDER BY ...)`.
    */
  def q42StringAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("c_nationkey")
      .agg(
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("rn"), col("c_custkey")))),
            x => x("c_custkey").cast("string"))).as("top3_custkeys"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  /** Calendar-dimension surface: date_trunc month rollup, quarter
    * extraction, and day-difference arithmetic against a fixed anchor
    * — the date-function family every reporting layer leans on,
    * exercised end to end against the oracle's calendar (both engines
    * must agree on month boundaries, quarter mapping, and day counts
    * across the whole order history). All derivations are exact
    * integer/calendar ops — no float in the grouping path.
    */
  def q43DateRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        quarter(col("o_orderdate")).as("qtr"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .as("age_days"),
        dec(col("o_totalprice")).as("price_dec"))
      .groupBy("month_start", "qtr")
      .agg(
        count(lit(1)).as("n_orders"),
        sum("price_dec").cast("double").as("revenue"),
        min("age_days").as("min_age_days"),
        max("age_days").as("max_age_days"))
      .orderBy("month_start")

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * semantics where NULL keys MATCH each other — what a plain equi
    * join silently drops (q39 pins the predicate-level 3VL story;
    * this pins the operator level). Both sides derive a nullable key
    * from events.props (`k` is NULL for unparseable props), aggregate
    * per key, and join null-safely: the NULL group must survive with
    * both sides' counts. Spark plans `<=>` as a hash join on the
    * null-safe-wrapped key — still a keyed shuffle, not a nested
    * loop, so the shape scales like any equi join.
    */
  def q44NullsafeJoin(s: SparkSession, d: String): DataFrame = {
    val parsed = Tables.events(s, d)
      .withColumn("k",
        get_json_object(col("props"), "$.k").cast("bigint") % 5)
    val clicks = parsed.filter(col("event_type") === "click")
      .groupBy("k").agg(count(lit(1)).as("n_clicks"))
    val views = parsed.filter(col("event_type") === "view")
      .groupBy("k").agg(count(lit(1)).as("n_views"))
    clicks.as("c")
      .join(views.as("v"), col("c.k") <=> col("v.k"))
      .select(col("c.k").as("k"), col("n_clicks"), col("n_views"))
      .orderBy(asc_nulls_first("k"))
  }

  /** Typed JSON parse: from_json with an explicit schema (vs q17's
    * path-extraction) — the malformed-tolerant typed-struct route a
    * pipeline takes when the props schema is known. Struct field
    * access, bucketed aggregation; null k (unparseable props) counted
    * separately as the data-quality signal.
    */
  def e1PropsStruct(s: SparkSession, d: String): DataFrame = {
    val parsed = Tables.events(s, d)
      .withColumn("p", from_json(col("props"), lit("k BIGINT")))
      .select(col("event_type"), col("p.k").as("k"))
    parsed
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"))
      // explicit NULLS FIRST: Spark's ASC default, but DuckDB's is
      // NULLS LAST — pin the same total order on both sides
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("k_mod"))
  }

  /** The SQL-surface demonstration text, shared VERBATIM with the
    * DuckDB oracle: one string, two engines, identical results — the
    * strongest possible statement that the library speaks ANSI SQL
    * (reference serving surface: serve/api.py query strings). Written
    * in the dialect intersection: CAST(SUM(decimal)) for exact sums,
    * RANK cast to INTEGER (DuckDB's is BIGINT, Spark's INT), shares
    * divided in DOUBLE (decimal-division scale rules differ between
    * engines; a single IEEE divide of two exact doubles does not).
    */
  val q35SharedSql: String =
    """WITH nrev AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
      |    COUNT(*) AS n_orders
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name, n_orders,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev_dec DESC, n_name) AS INTEGER) AS rev_rank,
      |  CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE) AS rev_share
      |FROM nrev
      |ORDER BY r_name, rev_rank""".stripMargin

  /** SQL API surface: register the corpus tables as temp views and run
    * [[q35SharedSql]] through `spark.sql` — the same Catalyst plan
    * (broadcast dims, partial aggregation, one window) the DataFrame
    * API would declare, arrived at from the SQL front door.
    */
  def q35Sql(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
    s.sql(q35SharedSql)
  }

  /** LATERAL correlated derived table — top-2 customers per nation,
    * SQL-level (the FROM-clause correlation a reporting tool emits;
    * q29 pins the correlated SCALAR subquery, this pins the table
    * form). ONE SQL string runs verbatim on both engines (the q35
    * pattern): Spark plans the lateral as a window-equivalent
    * (rank-per-partition) under the hood — no per-row re-execution.
    */
  val q45SharedSql: String =
    """SELECT n.n_name, t.c_custkey, t.c_acctbal
      |FROM nation n,
      |  LATERAL (
      |    SELECT c_custkey, c_acctbal FROM customer
      |    WHERE c_nationkey = n.n_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey
      |    LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin

  /** SQL front door for [[q45SharedSql]]. */
  def q45Lateral(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(q45SharedSql)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): bounded-depth BFS over
    * the nation trade graph — min-hop distance and bounded-walk count
    * from nation 0 over edges carrying ≥ 50 lineitems. ONE SQL string
    * verbatim on both engines; the recursion is depth-bounded
    * (hops < 2) with UNION ALL, the portable recursive form (both
    * engines iterate the frontier; the bound, not dedup semantics,
    * terminates it). The relational sibling of [[graft.operators.Graph]]'s
    * iterative PageRank and Dedup's label propagation — same frontier
    * expansion, declared instead of loop-driven.
    */
  val q46SharedSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY c.c_nationkey, s.s_nationkey
      |  HAVING COUNT(*) >= 50),
      |walk(node, hops) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, 0 AS hops
      |  UNION ALL
      |  SELECT e.dst, w.hops + 1
      |  FROM walk w JOIN edges e ON e.src = w.node
      |  WHERE w.hops < 2)
      |SELECT node, MIN(hops) AS min_hops, COUNT(*) AS n_walks
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  /** SQL front door for [[q46SharedSql]]. */
  def q46RecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    s.sql(q46SharedSql)
  }

  /** Sliding-window event aggregation in BATCH via the native
    * `window(ts, "1 hour", "15 minutes")` generator — each event lands
    * in exactly 4 overlapping hour windows (the batch twin of the
    * streaming hourly aggregate, with slide). The window explode is
    * map-side (4 rows per event) feeding one partial-aggregated
    * shuffle on (window, type) — linear at any event volume.
    */
  def q36SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** Join-key skew profile over the orders fact (see
    * SkewJoin.skewProfile): the top-10 heaviest customer keys and
    * their share — the measurement that justifies q25's salting.
    */
  def k1SkewProfile(s: SparkSession, d: String): DataFrame =
    SkewJoin.skewProfile(Tables.orders(s, d), "o_custkey")

  /** Referential-integrity audit across the star schema — the
    * relationships test of a dbt-style quality suite (the reference
    * ships not_null/accepted-range checks; FK audits are the same
    * contract one level up). Each FK edge reports child rows, orphan
    * rows, and the orphan ratio — computed in ONE pass per edge: a
    * left join against the (distinct) parent key with
    * count + sum(parent-key-is-null) in the same aggregation, instead
    * of scanning the child twice (total count + separate anti-join;
    * that shape scanned lineitem six times across its three audits).
    * The parent side deduplicates its key first so a dirty parent
    * (duplicated PK) cannot fan the child count out — the audit then
    * still reports truthful orphan counts.
    */
  def dq1RefIntegrity(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, child: DataFrame, key: String,
              parent: DataFrame, pk: String): DataFrame =
      child.select(col(key))
        .join(parent.select(col(pk)).distinct(), col(key) === col(pk), "left")
        .agg(
          count(lit(1)).as("n_child"),
          coalesce(sum(when(col(pk).isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_child"), col("n_orphans"),
          (col("n_orphans").cast("double") / col("n_child")).as("orphan_ratio"))
    audit("lineitem.l_orderkey->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
      .unionByName(audit("lineitem.l_partkey->part", Tables.lineitem(s, d),
        "l_partkey", Tables.part(s, d), "p_partkey"))
      .unionByName(audit("lineitem.l_suppkey->supplier", Tables.lineitem(s, d),
        "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
      .unionByName(audit("orders.o_custkey->customer", Tables.orders(s, d),
        "o_custkey", Tables.customer(s, d), "c_custkey"))
      .orderBy("relationship")
  }

  /** Column profiler over lineitem — the ANALYZE-style audit run
    * before trusting a table: per column, row/null counts, exact
    * distinct count, and min/max rendered as strings. Plan shape: one
    * COLUMN-PRUNED scan per profiled column feeding a two-level
    * aggregation — groupBy(value) partial-aggregates distinct values
    * map-side (the shuffle carries each partition's distinct values,
    * never its rows), then a 1-row rollup takes counts and min/max.
    * On columnar storage N one-column scans read the same bytes as
    * one N-column scan, and this shape beats the single-scan
    * alternative (multi-DISTINCT wide agg = one Expand hashing
    * scan-rows × columns; measured 8.0 s vs 1-2 s here at sf0.1)
    * while keeping every column's DAG independent — on a cluster the
    * five profiles run concurrently. At 100 TB exact NDV is the
    * expensive term in any engine; the approx swap-in is x1's HLL
    * partial-agg shape (engine-specific estimates, so THIS oracle
    * pins the exact form). Doubles are profiled through
    * DECIMAL(18,2) so min/max strings cannot diverge on float
    * formatting; the timestamp column through DATE (day grain is the
    * profile contract, and it dodges engine timestamp-rendering
    * drift).
    */
  def dq2Profile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // (name, profiled expression) — DECIMAL/DATE renderings per doc
    val profiled: Seq[(String, Column)] = Seq(
      "l_orderkey" -> col("l_orderkey"),
      "l_quantity" -> col("l_quantity").cast("decimal(18,2)"),
      "l_extendedprice" -> col("l_extendedprice").cast("decimal(18,2)"),
      "l_returnflag" -> col("l_returnflag"),
      "l_shipdate" -> col("l_shipdate").cast("date"))
    profiled.map { case (n, c) =>
      li.select(c.as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(
          sum("cnt").as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .as("n_null"),
          count("v").as("n_distinct"),
          min("v").cast("string").as("min_val"),
          max("v").cast("string").as("max_val"))
        .select(lit(n).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
      .orderBy("column_name")
  }

  /** String-predicate family over the part dim: LIKE containment,
    * regexp group extraction (brand number), case mapping, string
    * MIN under binary collation — the scan-level string operators a
    * log/text warehouse leans on, all codegen'd and pushdown-friendly.
    */
  def q38StringOps(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).cast("int").as("brand_no"),
        col("p_name").like("%widget%").cast("int").as("is_widget"),
        (col("p_type") === "PROMO").cast("int").as("is_promo"),
        upper(col("p_name")).as("uname"),
        col("p_size"), dec(col("p_retailprice")).as("price_dec"))
      .groupBy("brand_no")
      .agg(
        count(lit(1)).as("n_parts"),
        sum("is_widget").as("n_widgets"),
        sum("is_promo").as("n_promo"),
        min("uname").as("first_uname"),
        sum("p_size").as("size_sum"),
        sum("price_dec").cast("double").as("retail_sum"))
      .orderBy("brand_no")

  /** Multiset EXCEPT ALL (bag semantics — each occurrence counts):
    * completes the set-op family next to q12-q14's DISTINCT variants.
    * Spark plans it as an aggregate over a tagged union (sum of
    * ±counts), one shuffle, no join.
    */
  def q37ExceptAll(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Ordered conversion funnel view → click → purchase: a user counts
    * at a stage only if the stage event happened strictly AFTER their
    * entry into the previous stage (min-ts semantics, the standard
    * product-analytics funnel). Three per-user MIN aggregations
    * chained by keyed joins — each stage is one partial-aggregated
    * shuffle on user_id, groups are user-sized, no skew at any event
    * volume.
    */
  def f1Funnel(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Cohort retention: users grouped by first-activity day, counted on
    * each later active day as an offset from the cohort day. Two
    * shuffles (per-user cohort min, then the cohort-offset count) —
    * the dashboard query behind every retention curve.
    */
  def f2Retention(s: SparkSession, d: String): DataFrame = {
    val active = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .dropDuplicates("user_id", "day")
    val cohort = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    active.join(cohort, "user_id")
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("int"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Three-valued-logic semantics pin, shared VERBATIM with the
    * oracle like [[q35SharedSql]]: NOT IN over a set containing NULL
    * matches nothing (x <> NULL is UNKNOWN, so the conjunction never
    * becomes TRUE), while NOT EXISTS over the same predicate counts
    * normally — the classic anti-join trap. An engine migration that
    * silently rewrites one into the other corrupts results; this row
    * pair proves both engines agree on BOTH semantics.
    */
  val q39SharedSql: String =
    """SELECT 'not_in' AS semantics, COUNT(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_orderstatus = 'P' THEN o_custkey ELSE NULL END
      |   FROM orders)
      |UNION ALL
      |SELECT 'not_exists' AS semantics, COUNT(*) AS n FROM customer
      |WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_orderstatus = 'P' AND o_custkey = c_custkey)
      |ORDER BY semantics""".stripMargin

  /** SQL front door for [[q39SharedSql]] (same registration pattern
    * as [[q35Sql]]).
    */
  def q39NullSemantics(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(q39SharedSql)
  }

  /** Fixed-width histogram of l_extendedprice in exact integer cents:
    * bin = cents div 500000 ($5,000 buckets). The binning is pure
    * integer arithmetic off the exact DECIMAL(18,2) cast — no float
    * rounding can move a value across a bin edge on either engine.
    * Shape: map-side bin id + partial-aggregated count per bin —
    * the per-bin group count is bounded by the price domain, linear
    * at any corpus scale.
    */
  def h1Histogram(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select((dec(col("l_extendedprice")) * lit(100)).cast("long").as("cents"),
        col("l_quantity"))
      .select(expr("cents div 500000").cast("int").as("bin"),
        col("cents"), col("l_quantity"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_items"),
        sum("l_quantity").as("sum_qty"),
        (min("cents").cast("double") / lit(100.0)).as("min_price"),
        (max("cents").cast("double") / lit(100.0)).as("max_price"))
      .withColumn("bin_lo", (col("bin") * 5000L).cast("long"))
      .select("bin", "bin_lo", "n_items", "sum_qty", "min_price", "max_price")
      .orderBy("bin")
}
