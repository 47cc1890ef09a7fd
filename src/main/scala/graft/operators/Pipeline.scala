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
}
