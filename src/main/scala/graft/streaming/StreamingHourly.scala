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

  /** stg-shaped stream (ts, endpoint, is_error, bytes_sent, ...) →
    * windowed hourly fact stream.
    */
  def hourlyFact(stg: DataFrame): DataFrame =
    stg
      .withWatermark("ts", "1 hour")
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

  /** Batch shape with identical semantics, for equivalence testing:
    * batch-mode execution of the same windowed plan.
    */
  def hourlyFactBatch(stg: DataFrame): DataFrame =
    stg
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

  /** File-source stream over a parquet directory of stg rows. */
  def readStgStream(spark: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
