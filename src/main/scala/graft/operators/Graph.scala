package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics as relational operators — weighted
  * PageRank over the nation-level trade graph (customer nation →
  * supplier nation, edge weight = lineitem count). The second
  * iterative-propagation operator next to Dedup.dedupClusters
  * (connected components): one keyed join + one partial aggregation
  * per round, never a driver-side graph.
  *
  * Scale shape: edges aggregate the fact tables ONCE (the only big
  * shuffle); each iteration then joins the bounded rank frame against
  * the bounded edge frame — at web scale (nodes = pages) the same two
  * steps stay keyed joins, with the rank frame checkpointed per round
  * exactly as dedupClusters does. Edge weights here are small enough
  * for BIGINT rank·weight products; a trillion-edge run would pre-scale
  * weights to per-source probabilities first.
  *
  * Determinism: all arithmetic is integral in micro-units (rank mass
  * S = 1e12). Per edge: contrib = (rank·w) div out_w; per round:
  * rank' = (S·15 div 100) div N + (85·Σcontrib) div 100 — truncating
  * integer division on both engines, so every round is bit-identical
  * in the oracle (no float accumulation anywhere). The damping split
  * (15/85) is the classic d = 0.85.
  */
object Graph {

  private val S = 1000000000000L // total rank mass, micro-units

  /** Edge list of the nation trade graph: src = customer nation,
    * dst = supplier nation, w = lineitem count.
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Fixed-iteration weighted PageRank (default 3 rounds, d = 0.85)
    * over [[tradeEdges]]. N comes from counting the nation dim — a
    * 25-row driver scalar, the same class of bounded action as
    * dedupClusters' convergence flag.
    */
  def pageRank(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node set (S/n division)")
    val edges = tradeEdges(s, d)
    val outW = edges.groupBy("src").agg(sum("w").as("out_w"))
    val e = Checkpoints.persistFrame( // read every round; don't re-run
      edges.join(outW, "src")         // the fact join (reliable-ckpt
        .select(col("src"), col("dst"), col("w"), col("out_w"))) // aware)
    val base = S * 15L / 100L / n // teleport mass per node, exact longs
    var ranks = nodes.select(col("node"), lit(S / n).as("r"))
    for (_ <- 1 to iters) {
      val inSum = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("(r * w) div out_w").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("in_sum"))
      ranks = nodes.select(col("node"))
        .join(inSum, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(in_sum, 0L)) div 100")).as("r"))
    }
    // materialize the (bounded, node-count-sized) result, then free
    // the edge frame's block-manager blocks immediately — left to the
    // ContextCleaner they linger until a driver GC (same discipline as
    // Dedup.dedupClusters)
    val result = Checkpoints.persistFrame(
      nodes.join(ranks, "node")
        .select(col("node"), col("n_name"), col("r").as("rank_micro"),
          (col("r").cast("double") / lit(1000000000000.0)).as("rank"))
        .orderBy(desc("rank_micro"), asc("node")))
    Checkpoints.unpersistCheckpoint(e)
    result
  }
}
