package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the classic 100 TB fact-table
  * reduction: build a compact bit set from the (small) key side,
  * ship it to every task, and drop fact rows whose key cannot
  * possibly match BEFORE the expensive shuffle/join. False positives
  * only ever let extra rows THROUGH to the exact join that follows,
  * so the final result is exactly the plain join's — the bloom is
  * pure plan optimization, which is why the DuckDB oracle for a
  * bloom-pruned query is simply the un-pruned SQL. (Spark's own
  * `runtime.bloomFilter` rewrite does this automatically for some
  * shapes; this operator is the explicit, composable form — usable
  * where the optimizer can't see the opportunity, e.g. across
  * materialization boundaries, or to reuse one filter across jobs.)
  *
  * Shape at scale: the bit set is mBits/64 longs — a BOUNDED sketch
  * whose size is independent of both sides' row counts (64 K bits =
  * 8 KB). Collecting it to the driver is the sketch-broadcast
  * pattern (what Spark's runtime filter does with its subquery
  * result), not a data collect; the probe-side test is then a pure
  * map-side codegen'd expression — the fact table never shuffles,
  * aggregates, or joins to be pruned.
  *
  * Determinism: bit positions come from xxhash64 with the salt as a
  * leading hashed value (hash_j(x) = xxhash64(j, x)) — deterministic
  * across runs and partitionings within Spark, and codegen'd native
  * long arithmetic on the probe side (no per-row string conversion or
  * hex digest; the result never depends on the hash because false
  * positives are cleared by the exact join that follows, so
  * cross-engine hash parity — the reason other operators here use
  * md5 — buys nothing and md5's per-row allocation cost is real on a
  * 100 TB probe side).
  */
object BloomPrune {

  /** Integer hash of the j-th salted key. */
  private def hash(j: Int, key: Column): Column =
    xxhash64(lit(j), key)

  /** Build the bloom over `keys(keyCol)`: mBits/64 longs. One
    * map-side partial-aggregated pass over the key side (small by
    * assumption), then a bounded driver materialization of the sketch.
    */
  def bloomBits(keys: DataFrame, keyCol: String, mBits: Int = 1 << 16,
                k: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val bitIdx = explode(array((0 until k).map(j =>
      pmod(hash(j, col(keyCol)), lit(mBits.toLong))): _*)).as("bit_idx")
    val words = keys.select(bitIdx)
      .select((col("bit_idx") / 64).cast("int").as("word_idx"),
        call_function("shiftleft", lit(1L), (col("bit_idx") % 64).cast("int")).as("bit"))
      .groupBy("word_idx")
      .agg(expr("bit_or(bit)").as("word"))
      .collect() // bounded: ≤ mBits/64 rows regardless of key count
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getAs[Int]("word_idx")) = r.getAs[Long]("word"))
    arr
  }

  /** Membership test as a scalar Column over a built bit set: all k
    * salted hashes must find their bit. Pure map-side, codegen'd —
    * the literal word array is a plan constant shipped with the task
    * closure, exactly like a broadcast scalar.
    */
  def mightContain(key: Column, bits: Array[Long], mBits: Int = 1 << 16,
                   k: Int = 3): Column = {
    // one shared array literal — k copies of an mBits/64-element
    // literal would bloat the plan and generated code k-fold
    val words = typedLit(bits.toSeq)
    (0 until k).map { j =>
      val idx = pmod(hash(j, key), lit(mBits.toLong))
      val word = element_at(words, (idx / 64).cast("int") + 1)
      word.bitwiseAND(call_function("shiftleft", lit(1L), (idx % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Rows of `probe` whose `probeCol` passes the bloom built over
    * `keys(keyCol)`. A superset of the exact semi-join (false
    * positives possible, false negatives impossible) — ALWAYS follow
    * with the exact join; this only cuts what reaches it.
    */
  def prefilter(probe: DataFrame, probeCol: String,
                keys: DataFrame, keyCol: String,
                mBits: Int = 1 << 16, k: Int = 3): DataFrame =
    probe.filter(mightContain(col(probeCol), bloomBits(keys, keyCol, mBits, k), mBits, k))
}
