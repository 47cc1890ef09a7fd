package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The reference warehouse models, re-expressed as DataFrame transforms.
  * DAG (dbt `ref()` lineage): stgLogs → {dimClient, dimEndpoint,
  * fctRequestsHourly}. Catalyst tracks the lineage in the logical plan,
  * so "materialization" is a persistence choice (see LogLake), not a
  * semantic one.
  */
object LogModels {

  /** Staging model (reference: dbt_project/models/staging/stg_logs.sql:7-16).
    * Derived columns:
    *   endpoint = path before '?'   — substring_index returns the whole
    *     string when '?' is absent, matching DuckDB split_part;
    *   date     = to_date(ts); hour = zero-padded "00".."23" STRING (the
    *     reference keeps hour a string, stg_logs.sql:15 — do not "fix" to int);
    *   is_error = int 0/1 (not boolean) so sum(is_error) matches.
    */
  def stgLogs(parsed: DataFrame): DataFrame =
    parsed.select(
      col("ts"),
      col("status"),
      col("bytes_sent"),
      substring_index(col("request_path"), "?", 1).as("endpoint"),
      col("client_ip"),
      col("user_agent"),
      to_date(col("ts")).as("date"),
      date_format(col("ts"), "HH").as("hour"),
      when(col("status") >= 400, 1).otherwise(0).cast(IntegerType).as("is_error")
    )

  /** Distinct client dimension (reference: models/marts/dim_client.sql:1). */
  def dimClient(stg: DataFrame): DataFrame =
    stg.select(col("client_ip").as("client_id"), col("user_agent")).distinct()

  /** Distinct endpoint dimension (reference: models/marts/dim_endpoint.sql:1). */
  def dimEndpoint(stg: DataFrame): DataFrame =
    stg.select("endpoint").distinct()

  /** Hourly fact at grain (date, hour, endpoint)
    * (reference: models/marts/fct_requests_hourly.sql:1-11).
    * `percentile` is Spark's EXACT interpolating percentile — semantics
    * identical to DuckDB `percentile_cont(0.95)`. `percentile_approx`
    * would not match an oracle. Exact percentile buffers per-group values;
    * at this grain (date×hour×endpoint) groups stay small even at 100 TB —
    * cardinality grows with distinct endpoints, values-per-group with
    * traffic, so monitor group sizes; approxPercentile is the documented
    * escape hatch for pathological groups.
    */
  def fctRequestsHourly(stg: DataFrame): DataFrame =
    stg
      .groupBy("date", "hour", "endpoint")
      .agg(
        count(lit(1)).as("requests"),
        sum("is_error").as("errors"),
        percentile(col("bytes_sent"), lit(0.95)).as("p95_bytes")
      )
}
