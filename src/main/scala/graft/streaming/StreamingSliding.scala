package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch sliding-window aggregate
  * (CorpusQueries.q36SlidingWindow): 1-hour windows sliding every
  * 15 minutes over the event stream, watermarked so state is bounded.
  *
  * Sliding windows multiply state by (window / slide) = 4 entries per
  * (window, type) key versus the tumbling case — the watermark still
  * bounds the total to (late-horizon / slide) × |types| live windows,
  * and every event is assigned its 4 windows map-side before the
  * stateful aggregation, exactly like the batch plan.
  */
object StreamingSliding {

  /** events stream (ts, event_type, value) → sliding-window counts.
    * Emits in append mode once the watermark closes each window.
    */
  def slidingCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    shaped(events.withWatermark("ts", delay))

  /** Batch execution of the identical plan, for equivalence tests —
    * the twins share ONE body ([[shaped]]), so their equivalence is
    * true by construction rather than by keeping two copies in sync.
    */
  def slidingCountsBatch(events: DataFrame): DataFrame = shaped(events)

  private def shaped(df: DataFrame): DataFrame =
    df
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
}
