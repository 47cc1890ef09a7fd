package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE INTO (CDC-apply / upsert) semantics as a batch operator — the
  * lakehouse table-maintenance primitive: apply a change batch of
  * inserts, updates, and deletes to a base snapshot in one pass.
  * Spark has no MERGE against plain parquet (that's the table-format
  * layer), but the relational core IS expressible: a single full-outer
  * join on the key, with per-row action resolution — which is exactly
  * what the format engines execute underneath.
  *
  * Scale shape: ONE shuffle of each side on the merge key (or zero for
  * the base if it is bucketed/clustered by key, the layout
  * [[graft.logs.LogLake]] writes); the change batch is typically a
  * small fraction of the base, so AQE picks a broadcast for it.
  * Nothing driver-side; actions resolve row-local after the join.
  *
  * The demo batch is derived DETERMINISTICALLY from the base snapshot
  * (delete every 97th key, reprice every 7th, re-insert every 13th
  * under a shifted key) so the oracle can replay the identical
  * derivation — the operator under test is the apply, not the batch.
  */
object Merge {

  /** Apply a change batch to a base frame. `changes` must carry the
    * key, an `op` column in {I, U, D}, and the full row payload for
    * I/U rows.
    *
    * Contract (the parts MERGE INTO would enforce with errors):
    *   - AT MOST ONE change row per key. The apply is a full-outer
    *     join, so multiple change rows for one key fan out multiple
    *     output rows (MERGE raises "multiple source rows matched"
    *     instead). Callers with a multi-row CDC feed must first
    *     collapse it to the latest change per key (window by sequence
    *     number — the standard CDC-compaction step).
    *   - A 'U' (or 'I') whose key is absent from the base is applied
    *     as an INSERT (upsert semantics — WHEN NOT MATCHED THEN
    *     INSERT), not an error. A 'D' for an absent key is a no-op.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    require(changes.columns.contains("op"), "changes needs an op column (I/U/D)")
    val payload = base.columns.filterNot(_ == key)
    payload.foreach(c => require(changes.columns.contains(c),
      s"changes missing payload column: $c"))
    val b = base.select(col(key).as("__bk"), struct(payload.toIndexedSeq.map(col): _*).as("__bv"))
    val c = changes.select(col(key).as("__ck"), col("op"),
      struct(payload.toIndexedSeq.map(col): _*).as("__cv"))
    b.join(c, col("__bk") === col("__ck"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D") // deletes drop
      .select(
        coalesce(col("__bk"), col("__ck")).as(key),
        // updates and inserts take the change payload; untouched rows
        // keep the base payload
        when(col("op").isin("I", "U"), col("__cv")).otherwise(col("__bv")).as("__v"))
      .select(col(key) +: payload.toIndexedSeq.map(p => col(s"__v.$p").as(p)): _*)
  }

  /** The demo merge over orders, summarized per status with exact
    * decimal sums (the post-merge audit a pipeline would run).
    */
  /** The deterministic CDC batch the u2/u7 demos share: delete keys
    * ≡0 mod 97, update keys ≡0 mod 7 (price +10), insert re-keyed
    * copies of keys ≡0 mod 13 — disjoint op sets per key, so the
    * one-change-per-key precondition holds (97 is prime to 7 and 13's
    * overlaps are re-keyed out of the base's key space).
    */
  def demoChanges(base: DataFrame): DataFrame = {
    val deletes = base.filter(col("o_orderkey") % 97 === 0)
      .select(base.columns.toIndexedSeq.map(col): _*).withColumn("op", lit("D"))
    val updates = base.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("op", lit("U"))
    val inserts = base.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("op", lit("I"))
    deletes.unionByName(updates).unionByName(inserts)
  }

  def u2MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val merged = applyChanges(base, demoChanges(base), "o_orderkey")
    merged.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }
}
