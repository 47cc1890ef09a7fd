package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data pipeline assembly — the capstone
  * composition: quality-rule cascade (TextAnalysis.QualityRules, the
  * same Column expressions behind the t11 audit view) → exact
  * content-hash dedup (keep the min-id representative, d2's rule) →
  * deterministic hash split (Sampling.splitCol) → per-split corpus
  * manifest. One DAG, one pass over the corpus: Catalyst fuses the
  * rule cascade and the hash projections into the scan, so composing
  * the operators costs no extra scans — the point of sharing Column
  * expressions instead of joining materialized operator outputs.
  *
  * Scale shape: the only shuffles are the dedup groupBy (64-char hash
  * keys, never bodies twice) and the final 3-group split agg; every
  * rule/flag/split column is map-side. The manifest is the artifact a
  * training job reads to size its shards.
  */
object Pipeline {

  def trainingManifest(s: SparkSession, d: String): DataFrame = {
    // the quality cascade evaluates MAP-SIDE on this scan
    // (TextAnalysis.QualityRules — same expressions as the t11 audit
    // view; joining that view back here would re-scan and shuffle the
    // corpus just to fetch a flag each row can compute itself)
    val docs = Tables.documents(s, d)
      .filter(TextAnalysis.QualityRules.keep)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("h", sha2(col("text"), 256))
    // exact dedup among the kept docs: min doc_id per content hash,
    // as a window over h — ONE shuffle and one scan (a groupBy-min +
    // join-back reads the corpus twice for the same answer); groups
    // are duplicate-set-sized, no skew
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("doc_id")
    docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_chars"),
        Sampling.splitCol.as("split"),
        size(TextAnalysis.toks).as("n_tokens"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .orderBy("split")
  }

  /** Cross-modal training-row assembly: documents joined 1:1 to their
    * embedding rows (doc_id = vec_id), rolled up per (split, label)
    * with the quality-keep count and exact integer embedding-norm
    * checksums — the manifest of a multimodal (text + vector) training
    * set. The modality join is a keyed equi-join (at scale: both sides
    * bucketed by id, zero-shuffle); norms fold per row in exact
    * micro-units² so the checksum is partition- and engine-independent.
    */
  def multimodalManifest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Sampling.splitCol.as("split"),
        TextAnalysis.QualityRules.keep.as("keep"),
        size(TextAnalysis.toks).as("n_tokens"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        aggregate(
          transform(col("embedding"),
            x => round(x.cast("double") * lit(1000000.0)).cast("long")),
          lit(0L), (a, m) => a + m * m).as("norm_sq"))
    docs.join(emb, col("doc_id") === col("vec_id"))
      .groupBy("split", "label")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // per-row norm_sq fits a long (64 dims × (1e6)² ≈ 6.4e13) but
        // the GROUP sum wraps Long past ~144k rows — exactly the scale
        // the checksum exists for — so it accumulates in DECIMAL(38,0)
        // and serves as a STRING (exact at any cardinality, and the
        // cross-engine compare stays representation-stable)
        sum(col("norm_sq").cast("decimal(38,0)")).cast("string")
          .as("norm_sq_sum"),
        sum("n_tokens").as("tokens_sum"))
      .orderBy("split", "label")
  }
}
