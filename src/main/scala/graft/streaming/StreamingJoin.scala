package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of
  * `TemporalJoins.rangeJoinFollowups`: purchases joined to the same
  * user's clicks landing in the (purchase, purchase + 30 min] band.
  *
  * Both sides carry a watermark and the join condition bounds c_ts
  * relative to p_ts in BOTH directions, so Spark can compute a state
  * eviction horizon for each side: a buffered purchase is dropped once
  * the click watermark passes p_ts + 30 min, a buffered click once the
  * purchase watermark passes c_ts. Without the time band this join
  * would buffer both streams forever — the bounded-state condition IS
  * the operator's 100 TB design.
  *
  * Inner join (not left): streaming left outer joins emit the
  * null-padded row only when the watermark closes the window, which is
  * correct but makes the batch-parity test timing-dependent; the inner
  * variant is deterministic per processed prefix.
  */
object StreamingJoin {

  /** events stream (ts, event_id, user_id, event_type, value) →
    * (purchase_id, user_id, click ts, click value) matches.
    */
  def purchaseClickMatches(events: DataFrame, delay: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("value"))
      .withWatermark("c_ts", delay)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"), col("value"))
  }
}
