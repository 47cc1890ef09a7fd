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
}
