package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data pipeline assembly — the capstone
  * composition: quality-rule cascade (TextAnalysis.qualityFilter) →
  * exact content-hash dedup (keep the min-id representative, d2's
  * rule) → deterministic hash split (Sampling.splitCol) → per-split
  * corpus manifest. One DAG, one pass over the corpus: Catalyst fuses
  * the rule cascade and the hash projections into the scan, so
  * composing the operators costs no extra scans — the point of
  * declaring each step as a DataFrame transform instead of a
  * materialized stage.
  *
  * Scale shape: the only shuffles are the dedup groupBy (64-char hash
  * keys, never bodies twice) and the final 3-group split agg; every
  * rule/flag/split column is map-side. The manifest is the artifact a
  * training job reads to size its shards.
  */
object Pipeline {

  def trainingManifest(s: SparkSession, d: String): DataFrame = {
    val kept = TextAnalysis.qualityFilter(s, d)
      .filter(col("keep")).select("doc_id")
    val docs = Tables.documents(s, d)
      .join(kept, "doc_id")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("h", sha2(col("text"), 256))
    // exact dedup among the kept docs: min doc_id per content hash
    val winners = docs.groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(winners, "doc_id")
      .select(col("doc_id"), col("n_chars"),
        Sampling.splitCol.as("split"),
        size(split(col("text"), " ")).as("n_tokens"))
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
    val keep = TextAnalysis.qualityFilter(s, d).select(col("doc_id"), col("keep"))
    val docs = Tables.documents(s, d)
      .join(keep, "doc_id")
      .select(col("doc_id"), Sampling.splitCol.as("split"), col("keep"),
        size(split(col("text"), " ")).as("n_tokens"))
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
        sum("norm_sq").as("norm_sq_sum"),
        sum("n_tokens").as("tokens_sum"))
      .orderBy("split", "label")
  }
}
