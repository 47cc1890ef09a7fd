package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming twin of the hourly fact (SURVEY.md §2.9/§7.2 M4):
  * the reference's group-by-derived-hour is exactly a 1-hour tumbling
  * window in disguise, so the streaming model is
  * `withWatermark + groupBy(window($"ts", "1 hour"), $"endpoint")`.
  *
  * p95 uses `percentile_approx` here: the exact percentile buffers all
  * per-group values in the state store — unbounded state for an
  * unbounded stream. The batch fact keeps the exact percentile (oracle
  * parity); the streaming twin trades exactness for bounded state,
  * which is the correct call on an infinite input.
  *
  * At scale: state is keyed by (window, endpoint); the watermark bounds
  * state size to (late-horizon / 1h) × |endpoints| entries, and late
  * rows beyond 1 hour are dropped instead of accumulating forever.
  */
object StreamingHourly {

  /** The shared aggregation body: stream and batch twins differ ONLY
    * by the watermark line, so their equivalence is true by
    * construction (two hand-copied blocks would silently drift on the
    * first one-sided edit). Label caveat: `window` boundaries are
    * epoch-aligned (UTC), while `date_format`/`to_date` render in the
    * session timezone — the hour/date labels match the batch model's
    * derived-hour labels only for whole-hour zone offsets. The
    * engine pins UTC ([[graft.GraftSession]]); reusing this twin
    * under a fractional-offset zone (e.g. +05:30) would shift labels.
    */
  private def shaped(df: DataFrame): DataFrame =
    df
      .groupBy(window(col("ts"), "1 hour"), col("endpoint"))
      .agg(
        count(lit(1)).as("requests"),
        sum("is_error").as("errors"),
        percentile_approx(col("bytes_sent"), lit(0.95), lit(10000))
          .as("p95_bytes_approx"))
      .select(
        to_date(col("window.start")).as("date"),
        date_format(col("window.start"), "HH").as("hour"),
        col("endpoint"), col("requests"), col("errors"),
        col("p95_bytes_approx"))

  /** stg-shaped stream (ts, endpoint, is_error, bytes_sent, ...) →
    * windowed hourly fact stream.
    */
  def hourlyFact(stg: DataFrame): DataFrame =
    shaped(stg.withWatermark("ts", "1 hour"))

  /** Batch twin for equivalence testing: the same plan, no watermark. */
  def hourlyFactBatch(stg: DataFrame): DataFrame = shaped(stg)

  /** File-source stream over a parquet directory of stg rows. */
  def readStgStream(spark: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
