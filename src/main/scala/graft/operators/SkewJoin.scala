package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual mitigation when a shuffle
  * join has hot keys too large for one task and the dim side is too
  * big to broadcast (AQE's skew-join split handles sort-merge skew
  * automatically; salting is the deterministic, planner-independent
  * form, and the same trick pre-partitions skewed aggregations).
  *
  * Mechanics: the fact side gets a salt in [0, salts) derived from a
  * caller-chosen discriminator column (NOT the join key — rows of one
  * hot key must spread); the dim side is replicated `salts` times.
  * Join key becomes (key, salt): a hot key's rows land on `salts`
  * tasks instead of one, at the cost of a `salts`× dim replication.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(discriminator), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(explodedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Join-key skew profile — the diagnostic that decides whether
    * [[saltedJoin]] (or AQE skew split) is needed at all: the top-k
    * heaviest key groups with their share of the table. One
    * partial-aggregated count per key, top-k via
    * TakeOrderedAndProject; the table total rides in as a broadcast
    * 1-row cross join (never a window over the full key set, which
    * would funnel every key through one task at scale).
    */
  def skewProfile(child: DataFrame, key: String, k: Int = 10): DataFrame = {
    val total = child.agg(count(lit(1)).as("total"))
    child.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("share"))
      .orderBy(desc("cnt"), asc("key"))
      .limit(k)
  }
}
