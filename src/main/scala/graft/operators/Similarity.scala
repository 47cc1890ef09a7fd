package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (64-dim array<float>).
  *
  *   - Brute-force cosine top-k: broadcast the (small) query set against
  *     the corpus — the correct baseline at any scale where |queries| is
  *     bounded; the corpus side streams, no shuffle of the corpus.
  *   - Sign-LSH bucketed top-k: bucket both sides by the sign bits of
  *     the leading dimensions (an axis-aligned random-hyperplane LSH);
  *     the join is keyed on the bucket — candidate count collapses by
  *     ~2^bits, the 100 TB scale path (trade recall for a keyed join).
  *   - Label centroids: element-wise mean via posexplode + exact
  *     DECIMAL sums (deterministic at any partitioning).
  *
  * Determinism: dot products fold the 64 element products strictly
  * left-to-right (higher-order `aggregate`), matching the oracle's
  * sequential `list_reduce` — bit-identical IEEE sums. Ranking uses the
  * cosine ROUNDED to 6 decimals with a vec_id tie-break so a last-ulp
  * difference can never flip an ordering.
  */
object Similarity {

  /** float[] → double[] so all arithmetic is IEEE double both sides. */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine via the engine's native codegen'd Catalyst expression
    * (graft.functions.CosineSimilarity): one fused Java loop per pair
    * inside whole-stage codegen. The higher-order formulation
    * (`aggregate(zip_with(...))`) computes the same fold but runs its
    * lambdas interpreted, per element — measurably slower in a kNN
    * inner loop. Arithmetic (left-to-right single pass, divide last) is
    * bit-identical to the oracle's sequential list_reduce.
    */
  private def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Brute-force cosine top-k: query vectors vec_id < nQueries against
    * the rest of the corpus. Broadcast nested-loop on the tiny query
    * side is intentional (queries are a constant-size set).
    */
  def knnBrute(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q"))
    val corpus = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(broadcast(queries))
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6")
      .orderBy("q_id", "rank")
  }

  /** Sign-LSH bucket of a vector: bits = sign of dims 1..nBits. */
  private def signBucket(v: Column, nBits: Int): Column =
    (1 to nBits).map(i =>
      when(element_at(v, i) > 0, lit(1 << (i - 1))).otherwise(lit(0)))
      .reduce(_ + _)

  /** Bucketed ANN: candidates restricted to the query's sign-LSH bucket;
    * the join is a keyed hash join on the bucket id (the scale path —
    * no broadcast of the corpus, no cartesian).
    */
  def knnBucketed(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3,
                  nBits: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q"),
        signBucket(col("embedding"), nBits).as("bucket"))
    val corpus = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c"),
        signBucket(col("embedding"), nBits).as("bucket"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(queries, "bucket")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6", "bucket")
      .orderBy("q_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: candidates restricted to
    * sign-LSH bucket collisions (keyed join — no all-pairs), kept when
    * cosine ≥ minCos. The embedding-space sibling of Dedup.minhashLsh:
    * at 100 TB you never materialize the n² pair space, only bucket
    * collisions. (This corpus has no planted embedding dups — max
    * pairwise cosine ≈ 0.51 — so the demonstration threshold 0.4
    * surfaces the closest genuine pairs.)
    */
  def embedNearDup(s: SparkSession, d: String, minCos: Double = 0.4,
                   nBits: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), dbl(col("embedding")).as("v"),
        signBucket(col("embedding"), nBits).as("bucket"))
    e.as("a")
      .join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos6", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos6") >= minCos)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"), col("cos6"))
      .orderBy("id1", "id2")
  }

  /** IVF-style ANN: label centroids act as the coarse quantizer
    * ("inverted file" cells); every vector is assigned to its
    * highest-dot-product centroid, and search runs only within the
    * query's cell — the classic IVF trade (recall for a keyed join)
    * and the second scale path next to sign-LSH bucketing.
    *
    * Determinism: centroid means use exact integer micro-units, and
    * cell assignment scores are per-term-quantized integer sums
    * (`round(v[pos]·mean·1e12)` per dimension, summed as BIGINT), so
    * the argmax cell is bit-identical in the oracle — no float sum
    * order dependence anywhere in the pipeline.
    */
  def knnIvf(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, d)
    val tall = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .withColumn("x", col("xf").cast("double")).drop("xf")
    val eLab = e.select(col("vec_id"), col("label"))
    // full-dim centroids in exact micro-units
    val centroids = tall.join(eLab, "vec_id")
      .withColumn("micro", round(col("x") * lit(1000000.0)).cast("long"))
      .groupBy(col("label").as("c_label"), col("pos"))
      .agg((sum("micro").cast("double") / lit(1000000.0) / count(lit(1)))
        .as("c_mean"))
      .localCheckpoint() // reused by every assignment below
    // cell assignment: argmax over integer-quantized dot terms
    val scores = tall.join(centroids, "pos")
      .withColumn("term",
        round(col("x") * col("c_mean") * lit(1000000000000.0)).cast("long"))
      .groupBy("vec_id", "c_label")
      .agg(sum("term").as("score"))
    val wCell = Window.partitionBy("vec_id")
      .orderBy(desc("score"), asc("c_label"))
    val cells = scores
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("cell"))
      .localCheckpoint() // self-joined below (queries vs corpus)
    val vecs = e.select(col("vec_id"), dbl(col("embedding")).as("v"))
      .join(cells, "vec_id")
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q"), col("cell"))
    val corpus = vecs.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("c_id"), col("v").as("c"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos6"), asc("c_id"))
    corpus.join(queries, "cell")
      .withColumn("cos6", round(cosine(col("q"), col("c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos6", "cell")
      .orderBy("q_id", "rank")
  }

  /** Int8 scalar quantization per vector — the storage/serving prep
    * step that shrinks an embedding corpus 4× (float32 → int8) before
    * ANN indexing. Per vector: elements quantized to exact integer
    * micro-units (round(x·1e6), the labelCentroids trick), then
    * max-abs-scaled to int8 as floor(micro·127 / maxabs_micro) — the
    * numerator is an exact long, the division is one correctly-rounded
    * IEEE op, and floor of a correctly-rounded double is
    * engine-identical, so every quantized value is bit-identical in the
    * oracle with no float-sum order hazard anywhere. Output is the
    * per-vector manifest: L2 norm in exact micro-unit² space, the
    * scale, and integer checksums (sum, |sum|, position-weighted dot)
    * that pin the full quantized vector under the hash compare.
    * Shape: posexplode (64 rows per vector) → partial-aggregated
    * groupBy(vec_id) — groups are vector-sized, no skew, linear at
    * 100 TB.
    */
  def quantizeEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("micro"))
      // per-vector scale from the array itself — no self-join back onto
      // an exploded frame (that shape would re-shuffle the corpus on
      // vec_id just to rejoin a scalar each row already owns)
      .withColumn("maxabs_micro", array_max(transform(col("micro"), abs(_))))
      .select(col("vec_id"), col("maxabs_micro"),
        posexplode(col("micro")).as(Seq("pos", "m")))
      // greatest(·,1) guards the all-zero vector: 0/0 would be NaN, and
      // NaN→BIGINT casts diverge between engines (the quantized values
      // are all zero then anyway, so the guard changes nothing else)
      .withColumn("q",
        floor((col("m") * 127L).cast("double") /
          greatest(col("maxabs_micro"), lit(1L))).cast("long"))
      .groupBy("vec_id", "maxabs_micro")
      .agg(
        count(lit(1)).cast("int").as("dim"),
        sum(col("m") * col("m")).as("norm_sq_micro"),
        sum("q").as("q_sum"),
        sum(abs(col("q"))).as("q_abs_sum"),
        sum(col("q") * (col("pos") + 1)).as("q_dot"))
      .select("vec_id", "dim", "maxabs_micro", "norm_sq_micro",
        "q_sum", "q_abs_sum", "q_dot")
      .orderBy("vec_id")

  /** Per-label centroids in tall form (label, dim, mean). Elements are
    * quantized to integer micro-units (round(x·1e6)) before summing:
    * integer sums are exact, so the mean is independent of row order and
    * partitioning — deterministic at any scale, and hash-identical in
    * the oracle. (A DECIMAL cast of an arbitrary float is NOT safe: the
    * engines' float→decimal rounding paths can differ by one ulp.)
    */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") < 4) // keep output compact: leading 4 dims
      .withColumn("micro",
        round(col("x").cast("double") * lit(1000000.0)).cast("long"))
      .groupBy("label", "pos")
      .agg(
        (sum(col("micro")).cast("double") / lit(1000000.0) / count(lit(1)))
          .as("mean"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")
}
