package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the reference's dbt tests re-expressed as
  * zero-row queries (reference: dbt_project/models/tests/generic.yml:1-27,
  * tests/test_status_range.sql:1-4, etl/ingest_logs.py:55-57).
  * A check "passes" when its violation query returns zero rows; at scale
  * `isEmpty` short-circuits (limit-1 under the hood) instead of counting
  * everything.
  */
object LogQuality {

  /** dbt `not_null` generic test: violations of non-null contract. */
  def notNullViolations(df: DataFrame, columns: Seq[String]): DataFrame =
    df.filter(columns.map(c => col(c).isNull).reduce(_ || _))

  /** Singular test: statuses outside [100, 599]. */
  def statusRangeViolations(stg: DataFrame): DataFrame =
    stg.filter(!col("status").between(100, 599))

  /** The reference's full test suite over stg + fct; returns
    * (check name → violation count). Counts run as one job each;
    * callers wanting pass/fail only should use the *Violations frames
    * with `.isEmpty`.
    */
  def runAll(stg: DataFrame, fct: DataFrame): Map[String, Long] = Map(
    "stg_not_null" -> notNullViolations(
      stg, Seq("ts", "status", "bytes_sent", "endpoint")).count(),
    "fct_not_null" -> notNullViolations(
      fct, Seq("date", "hour", "endpoint", "requests", "errors")).count(),
    "status_range" -> statusRangeViolations(stg).count()
  )

  /** ETL inline asserts (reference: ingest_logs.py:55-57). */
  def assertIngest(parsed: DataFrame): Unit = {
    require(!parsed.isEmpty, "no rows parsed from log file")
    require(statusRangeViolations(parsed).isEmpty, "status out of [100,599]")
  }
}
