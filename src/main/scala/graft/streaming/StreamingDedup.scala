package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication + stream-static enrichment — the remaining
  * two streaming patterns a training-data ingest pipeline needs
  * (SURVEY.md §7.2 M4):
  *
  *   - `dedupWithinWatermark`: exactly-once semantics over an
  *     at-least-once source. dropDuplicatesWithinWatermark bounds the
  *     dedup state to the watermark horizon — the 100 TB answer to
  *     "dropDuplicates on a stream grows state forever".
  *   - `enrichWithDim`: stream ⋈ static dimension. The static side is
  *     broadcast per micro-batch; no state, no shuffle of the stream.
  */
object StreamingDedup {

  /** Drop duplicate event_ids arriving within the watermark horizon.
    * State holds only ids newer than (max event time − delay).
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Enrich a stream with a static dimension table (broadcast join —
    * dimension re-read per batch only if it changes; no streaming state).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")
}
