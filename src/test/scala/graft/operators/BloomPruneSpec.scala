package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomPrune: no false negatives ever, real pruning on disjoint keys,
  * and end-to-end equivalence of the bloom-pruned join to the plain
  * join (the q32 contract).
  */
class BloomPruneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mightContain has no false negatives on inserted keys") {
    import spark.implicits._
    val keys = (1L to 500L).map(_ * 7919).toDF("k")
    val bits = BloomPrune.bloomBits(keys, "k", mBits = 1 << 14, k = 3)
    val misses = keys.filter(!BloomPrune.mightContain(col("k"), bits, 1 << 14, 3))
    assert(misses.isEmpty, "every inserted key must pass its own bloom")
  }

  test("disjoint probe keys are mostly pruned (bounded false-positive rate)") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("k")
    val bits = BloomPrune.bloomBits(keys, "k", mBits = 1 << 14, k = 3)
    val probes = (1000000L to 1004999L).toDF("k")
    val passed = probes.filter(BloomPrune.mightContain(col("k"), bits, 1 << 14, 3)).count()
    // 500 keys * 3 hashes in 16384 bits -> fill ~9%, fp ~ 0.09^3 ~ 1e-3;
    // 50 of 5000 would already be 10x the expectation
    assert(passed < 50, s"false-positive rate too high: $passed of 5000")
  }

  test("bloom-pruned join equals the plain join; the prefilter actually cuts rows") {
    val li = graft.Tables.lineitem(spark, sf)
    val urgent = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.prefilter(li, "l_orderkey", urgent, "o_orderkey")
    val prunedCount = pruned.count()
    val exactCount = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(prunedCount >= exactCount, "false negatives are impossible")
    assert(prunedCount < li.count(), "the bloom must prune something")

    val got = CorpusQueries.q32BloomJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }
}
