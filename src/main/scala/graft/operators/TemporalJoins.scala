package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators over the `events` stream table — the two
  * time-series joins Spark has no first-class operator for, built the
  * scale-correct way:
  *
  *   - AS-OF join (each purchase ↔ the most recent click at-or-before
  *     it, per user) via the union + carry-forward-window formulation:
  *     both inputs are unioned, sorted once per user, and a
  *     `last(_, ignoreNulls)` running window carries the latest click
  *     forward. ONE shuffle of each input on the partition key, no
  *     range join, no per-row probe — the classic distributed as-of
  *     pattern. A join-based formulation (t1.ts >= t2.ts) would plan a
  *     per-user cross product and collapse at scale.
  *   - Bounded RANGE join (clicks within 30 min after each purchase):
  *     an equi-join on user_id with the time band as a join-time
  *     filter — planned as a hash join keyed on user_id; the band
  *     bounds the fan-out. At 100 TB the refinement is bucketing both
  *     sides by (user_id, coarse time bucket); the equi-key shape here
  *     is what makes that a drop-in change.
  *
  * Determinism: total order (ts, event_id) within a user (event_id is
  * unique), so the carried click is unambiguous even with duplicate
  * timestamps; gaps are integer microseconds. The DuckDB oracle's
  * LAST_VALUE IGNORE NULLS twin was cross-checked equal to DuckDB's
  * native ASOF JOIN on the same data.
  */
object TemporalJoins {

  /** General backward as-of join: for each left row, carry forward the
    * most recent right row (by `(tsCol, tieCol)` at-or-before the left
    * row's time) within the same `keyCol` group. `carry` names the
    * right-side columns to surface (prefixed `asof_`).
    *
    * Union + carry-forward window: one shuffle of each input on
    * `keyCol`, one sort per group — never a per-row range probe.
    * Ties: right rows ordering exactly equal to a left row's
    * (ts, tie) sort ahead of it match; the tie column makes the pick
    * total-order deterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String,
               carry: Seq[String]): DataFrame = {
    // fail fast with a clear message instead of silently wrong results
    // (a pre-existing __side/asof_* column would be clobbered by the
    // tagging below) or a confusing mid-plan analysis error
    for ((df, side) <- Seq(left -> "left", right -> "right")) {
      require(!df.columns.contains("__side"),
        s"asofJoin: $side input already has a __side column")
      val clash = df.columns.filter(_.startsWith("asof_"))
      require(clash.isEmpty,
        s"asofJoin: $side input has reserved asof_-prefixed columns: ${clash.mkString(", ")}")
      for (c <- Seq(keyCol, tsCol, tieCol))
        require(df.columns.contains(c),
          s"asofJoin: $side input is missing required column '$c'")
    }
    for (c <- carry)
      require(right.columns.contains(c),
        s"asofJoin: right input is missing carry column '$c'")
    val leftTagged = left.withColumn("__side", lit(1))
    val rightTagged = right.withColumn("__side", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at identical (ts, tie) so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop("__side")
      .drop(carry.filter(c => right.columns.contains(c) && !left.columns.contains(c)): _*)
  }

  /** For every purchase event: the most recent click event of the same
    * user with (ts, event_id) at-or-before it, plus the gap in µs
    * (null when the user never clicked before the purchase).
    * Thin oracle-checked instantiation of [[asofJoin]].
    */
  def asofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select("event_id", "user_id", "ts", "event_type")
    asofJoin(
      left = e.filter(col("event_type") === "purchase"),
      right = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("click_id"), col("ts").as("click_ts")),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      carry = Seq("click_id", "click_ts"))
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("asof_click_id").as("click_id"),
        col("asof_click_ts").as("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("asof_click_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** For every purchase: count + value of the same user's clicks in the
    * following 30 minutes (left join — purchases with no follow-up
    * clicks stay, with n_clicks = 0 and null click_value).
    */
  def rangeJoinFollowups(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
    p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") > col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"),
        "left")
      .groupBy("purchase_id", "user_id", "p_ts")
      .agg(
        count(col("c_ts")).as("n_clicks"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("click_value"))
      .orderBy("purchase_id")
  }
}
