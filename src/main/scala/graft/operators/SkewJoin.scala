package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual mitigation when a shuffle
  * join has hot keys too large for one task and the dim side is too
  * big to broadcast (AQE's skew-join split handles sort-merge skew
  * automatically; salting is the deterministic, planner-independent
  * form, and the same trick pre-partitions skewed aggregations).
  *
  * The production entry point is the TWO-PATH form
  * ([[saltedJoinHotKeys]] / [[saltedJoinForKeys]]): only keys flagged
  * by the skew profile get salted; the cold majority takes a plain
  * keyed join, and the two results union. Salting every key
  * ([[saltedJoinAll]]) replicates the ENTIRE dim side `salts`× — at
  * 100 TB that replication is pure waste for the >99% of keys that are
  * not hot, and it was measured as this suite's heaviest query before
  * the two-path rewrite (q25: 5.4 s driver-bench → plain-join cost).
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `key`, salting ONLY the given hot
    * keys. Hot fact rows spread over `salts` sub-keys (salt derived
    * from a caller-chosen discriminator column — NOT the join key; the
    * rows of one hot key must scatter); only the hot SLICE of the dim
    * (≤ hotKeys.size rows per salt) is replicated. Cold rows take the
    * untouched keyed join, so the planner (and AQE) still pick
    * broadcast/SMJ freely for the bulk of the data.
    *
    * An empty `hotKeys` degenerates to the plain join — the correct
    * production behavior when the profile finds no skew, and the
    * reason this operator is safe to leave in a pipeline permanently.
    *
    * NULL join keys: inner-join semantics drop them on every path
    * (`isin` evaluates NULL for a NULL key, so such rows reach neither
    * branch — same rows the plain inner join would discard).
    */
  def saltedJoinForKeys(fact: DataFrame, dim: DataFrame, key: String,
                        discriminator: Column, salts: Int,
                        hotKeys: Seq[Any]): DataFrame = {
    if (hotKeys.isEmpty) fact.join(dim, Seq(key))
    else {
      val isHot = col(key).isin(hotKeys: _*)
      val cold = fact.filter(!isHot).join(dim, Seq(key))
      val hot = saltedJoinAll(
        fact.filter(isHot), dim.filter(isHot), key, discriminator, salts)
      cold.unionByName(hot)
    }
  }

  /** Two-path salted join with the hot-key set measured from the fact
    * side: keys whose row share is ≥ `hotShare` (top `maxHotKeys` by
    * count). The probe is ONE job over ONE column: a rollup fuses the
    * per-key counts and the grand total into the same partial-
    * aggregated pass (grouping() tells the total row apart from a
    * genuine NULL key), top-k'd via TakeOrderedAndProject — so the
    * whole diagnosis costs a single column-pruned scan, and the
    * collect is bounded at `maxHotKeys`+1 rows, the same class of
    * bounded driver action as the PQ codebook. Pipelines that join the
    * same fact repeatedly should profile once and call
    * [[saltedJoinForKeys]] with the cached key set.
    */
  def saltedJoinHotKeys(fact: DataFrame, dim: DataFrame, key: String,
                        discriminator: Column, salts: Int,
                        hotShare: Double = 0.001,
                        maxHotKeys: Int = 64): DataFrame = {
    val probe = fact.select(col(key).as("key"))
      .rollup(col("key"))
      .agg(count(lit(1)).as("cnt"), grouping(col("key")).cast("int").as("g"))
      .orderBy(desc("g"), desc("cnt"))
      .limit(maxHotKeys + 1)
      .collect()
    val total = probe.find(_.getAs[Int]("g") == 1)
      .map(_.getAs[Long]("cnt")).getOrElse(0L)
    val hot = probe.iterator
      .filter(r => r.getAs[Int]("g") == 0 && !r.isNullAt(0) &&
        total > 0 && r.getAs[Long]("cnt").toDouble / total >= hotShare)
      .map(_.get(0)).toSeq
    saltedJoinForKeys(fact, dim, key, discriminator, salts, hot)
  }

  /** The salt-everything primitive (used by the two-path form on its
    * hot slice): every fact row gets a salt in [0, salts) and the dim
    * side replicates `salts`×, so one hot key's rows land on `salts`
    * tasks instead of one. Call this directly only when the dim is a
    * handful of rows AND every key is hot; otherwise use
    * [[saltedJoinForKeys]].
    */
  def saltedJoinAll(fact: DataFrame, dim: DataFrame, key: String,
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
    * salting (or AQE skew split) is needed at all: the top-k
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
