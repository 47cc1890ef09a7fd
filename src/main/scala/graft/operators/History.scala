package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Slowly-changing-dimension (Type 2) history build — the lakehouse
  * dimension-maintenance pattern the reference's star schema implies
  * but its 7-row fixture never needs (reference: transform/models
  * stg→dim layering). Given an event stream carrying an attribute per
  * entity, produce the versioned history: one row per (entity,
  * attribute run) with effective_from / effective_to validity bounds
  * and an is_current flag.
  *
  * Shape: two window passes over the same (user_id | ts, event_id)
  * partitioning — change detection via lag, then validity bounds via
  * lead over the change rows only. ONE shuffle total: both windows and
  * the final per-user output share the user_id clustering, and groups
  * are entity-sized, so there is no skew at any event volume. This is
  * the streaming-CDC compaction run as a batch: at 100 TB the same two
  * windows apply per partition-pruned entity shard.
  *
  * Determinism: the event order is pinned by (ts, event_id) — a total
  * order — so run boundaries, versions, and validity bounds are
  * identical under any partitioning and in the oracle.
  */
object History {

  /** SCD2 history of each user's event_type attribute, restricted to
    * user_id < maxUsers to keep the verified output compact (the
    * operator itself is unbounded).
    */
  def scd2History(s: SparkSession, d: String, maxUsers: Int = 25): DataFrame =
    scd2(Tables.events(s, d).filter(col("user_id") < maxUsers),
      entity = "user_id", attr = "event_type", ts = "ts", tie = "event_id")

  /** Generic SCD2 over (entity, attr, ts, tie): collapse consecutive
    * equal-attr runs into versioned validity intervals.
    */
  def scd2(events: DataFrame, entity: String, attr: String,
           ts: String, tie: String): DataFrame = {
    Seq(entity, attr, ts, tie).foreach(c =>
      require(events.columns.contains(c), s"missing column: $c"))
    val order = Window.partitionBy(entity).orderBy(col(ts), col(tie))
    // a row opens a new version when its attribute differs from the
    // previous event's (or it is the entity's first event)
    val marked = events
      .select(col(entity), col(attr), col(ts), col(tie))
      .withColumn("prev_attr", lag(col(attr), 1).over(order))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attr))
    val vOrder = Window.partitionBy(entity).orderBy(col(ts), col(tie))
    marked
      .withColumn("version", row_number().over(vOrder))
      .withColumn("effective_to", lead(col(ts), 1).over(vOrder))
      .select(
        col(entity),
        col("version"),
        col(attr),
        col(ts).as("effective_from"),
        col("effective_to"),
        col("effective_to").isNull.as("is_current"))
      .orderBy(col(entity), col("version"))
  }
}
