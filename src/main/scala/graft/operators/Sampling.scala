package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling / split-assignment operators for a
  * training-data pipeline. Random sampling (`df.sample`) is
  * partition-order-dependent and irreproducible across engines; both
  * operators here derive their randomness from a content hash instead —
  * every row's fate is a pure function of the row, so the split is
  * stable under repartitioning, re-runs, engine changes, and (at
  * 100 TB) across incremental ingestion batches. This is the standard
  * hash-split technique for train/eval hygiene: a document's split
  * never changes when the corpus around it grows.
  *
  * Hash: first 60 bits of md5 (hex chars 1-15) as a BIGINT — exists
  * verbatim in the DuckDB oracle (`('0x' || substr(md5(x),1,15))::BIGINT`),
  * so assignments are bit-identical. Map-only; no shuffle except the
  * final presentation sort / group.
  */
object Sampling {

  /** 60-bit integer hash of a salted document identity. */
  private[operators] def hash60(salt: String): Column =
    conv(substring(md5(concat(lit(salt),
      col("doc_id").cast("string"), lit(":"), col("text"))), 1, 15), 16, 10)
      .cast("long")

  /** Split bucket: hash % 100 (the single source of truth — any other
    * operator that needs the train/val/test rule derives it from here,
    * so the rule can never silently diverge between split assignment
    * and its consumers, e.g. contamination detection).
    */
  private[operators] def bucketCol: Column = hash60("") % 100

  /** Train/val/test label for a bucket column: 80/10/10. */
  private[operators] def splitFromBucket(bucket: Column): Column =
    when(bucket < 80, "train")
      .when(bucket < 90, "val")
      .otherwise("test")

  /** Per-document train/val/test label (bucketCol ∘ splitFromBucket). */
  private[operators] def splitCol: Column = splitFromBucket(bucketCol)

  /** Train/val/test assignment: bucket = hash % 100 → 80/10/10.
    * Per-document so membership itself is oracle-checked.
    */
  def splitAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket", bucketCol)
      .withColumn("split", splitFromBucket(col("bucket")))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Fixed-size deterministic "reservoir" per source stratum: the n
    * documents with the smallest salted content hash — the
    * distributed, reproducible equivalent of reservoir sampling
    * (hash order is uniform and content-pinned, so the chosen set is
    * stable under repartitioning, re-runs, and engine changes, and
    * each stratum yields EXACTLY n rows however large it grows —
    * unlike rate-based sampling, whose output scales with the data).
    * Shape: map-only hash + per-stratum top-n window; at 100 TB the
    * window groups are stratum-sized but row_number short-circuits
    * through WindowGroupLimit (partial top-n per task before the
    * shuffle).
    */
  def reservoirSample(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("rk"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rk", hash60("res|"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("source", "rn", "doc_id", "rk")
      .orderBy("source", "rn")
  }

  /** Sequence packing: lay each source's documents out in doc_id order
    * and assign every document to the token-budget bin where its first
    * token lands (bin = preceding cumulative tokens ÷ budget) — the
    * contiguous greedy packing a training pipeline uses to fill
    * fixed-length context windows without reordering the corpus.
    * Packing is PER SOURCE deliberately: a global layout would need a
    * total sort, while per-source packing is one window over
    * source-partitioned data — at 100 TB each shard packs
    * independently and the layout of one source never depends on
    * another's size. Output is the per-bin manifest (doc count, token
    * fill, and an id-sum that pins exact membership under the oracle's
    * hash compare).
    */
  def packSequences(s: SparkSession, d: String, budget: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.toks).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      // (cum - n_tokens) / budget: integer division of the tokens that
      // precede this document — exact in both engines
      .withColumn("bin",
        expr(s"(cum - n_tokens) div $budget"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("bin_tokens"),
        sum("doc_id").as("doc_id_sum"))
      .orderBy("source", "bin")
  }

  /** Weighted source mixture: per-source sampling rates from a small
    * mixture-weights dimension (the up/down-sampling step that shapes
    * a training corpus — e.g. upweight curated sources, downweight
    * crawl). The weights frame is a broadcast dim join — never a
    * shuffle of the corpus side; membership is the same content-hash
    * gate as every sampler here, so a document's fate is pinned under
    * re-runs and ingestion growth. Unknown sources fall back to a
    * default rate rather than silently dropping.
    */
  /** Mixture config (source → sampling rate %); public so the oracle
    * SQL is generated from the SAME table — one source of truth. */
  val MixtureRates: Seq[(String, Int)] =
    (0 until 20).map(i => s"src$i" -> (10 + (i % 7) * 12))

  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    val rates = s.createDataFrame(MixtureRates).toDF("source", "rate_pct")
    Tables.documents(s, d)
      .join(broadcast(rates), Seq("source"), "left")
      .withColumn("rate_pct", coalesce(col("rate_pct"), lit(50)))
      .withColumn("kept", hash60("mix|") % 100 < col("rate_pct"))
      .groupBy("source", "rate_pct")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
      .orderBy("source")
  }

  /** Stratified 30% sample per source stratum (deterministic, salted
    * independently of splitAssign). Output is per-stratum: totals,
    * sampled count, and the exact sum of sampled doc_ids — the id sum
    * pins the sampled MEMBERSHIP, not just its size, under the oracle
    * hash compare.
    */
  def stratifiedSample(s: SparkSession, d: String, pct: Int = 30): DataFrame =
    Tables.documents(s, d)
      .withColumn("kept", hash60("strat|") % 100 < pct)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("kept"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy("source")
}
