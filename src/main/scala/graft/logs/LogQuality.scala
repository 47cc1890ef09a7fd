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

  /** dbt `not_null` generic test: violations of non-null contract.
    * Zero columns means zero violations (not an empty.reduce crash).
    */
  def notNullViolations(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map(c => col(c).isNull).reduceOption(_ || _)
      .fold(df.limit(0))(df.filter)

  /** Singular test: statuses outside [100, 599]. */
  def statusRangeViolations(stg: DataFrame): DataFrame =
    stg.filter(!col("status").between(100, 599))

  /** The reference's full test suite over stg + fct; returns
    * (check name → violation count). All checks run as ONE Spark job:
    * the violation frames are unioned with a check label and counted
    * in a single grouped aggregation — one job per run instead of one
    * job per check. (The union plans independent subtrees, so an input
    * appearing in two checks is still scanned twice within that job;
    * callers that need single-scan semantics should cache stg first.)
    */
  def runAll(stg: DataFrame, fct: DataFrame): Map[String, Long] = {
    import org.apache.spark.sql.functions.lit
    val labeled = Seq(
      "stg_not_null" -> notNullViolations(
        stg, Seq("ts", "status", "bytes_sent", "endpoint")),
      "fct_not_null" -> notNullViolations(
        fct, Seq("date", "hour", "endpoint", "requests", "errors")),
      "status_range" -> statusRangeViolations(stg)
    )
    val unioned = labeled
      .map { case (name, df) => df.select(lit(name).as("check")) }
      .reduce(_ union _)
    val counts = unioned.groupBy("check").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    labeled.map { case (name, _) => name -> counts.getOrElse(name, 0L) }.toMap
  }

  /** ETL inline asserts (reference: ingest_logs.py:55-57). */
  def assertIngest(parsed: DataFrame): Unit = {
    require(!parsed.isEmpty, "no rows parsed from log file")
    require(statusRangeViolations(parsed).isEmpty, "status out of [100,599]")
  }
}
