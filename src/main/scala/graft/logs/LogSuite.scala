package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference log engine's queries, exposed in driver-contract shape
  * ((SparkSession, sfDir) => DataFrame — sfDir unused, the input is the
  * golden fixture routed through the full raw → parse → stg → fact
  * lineage). p95 columns are rounded to 4 decimals at the OUTPUT edge
  * only, so a last-ulp interpolation difference vs the oracle's
  * percentile_cont can never flip the hash; the engine itself keeps the
  * exact value.
  */
object LogSuite {

  private def fct(s: SparkSession): DataFrame = LogFixture.fct(s)

  def stg(s: SparkSession): DataFrame =
    LogFixture.stg(s).orderBy("ts", "endpoint")

  def dimClient(s: SparkSession): DataFrame =
    LogModels.dimClient(LogFixture.stg(s)).orderBy("client_id", "user_agent")

  def dimEndpoint(s: SparkSession): DataFrame =
    LogModels.dimEndpoint(LogFixture.stg(s)).orderBy("endpoint")

  def fctHourly(s: SparkSession): DataFrame =
    fct(s)
      .withColumn("p95_bytes", round(col("p95_bytes"), 4))
      .orderBy("date", "hour", "endpoint")

  def fctHourlyApprox(s: SparkSession): DataFrame =
    LogModels.fctRequestsHourlyApprox(LogFixture.stg(s))
      .withColumn("p95_bytes", round(col("p95_bytes"), 4))
      .orderBy("date", "hour", "endpoint")

  def errorsByEndpoint(s: SparkSession): DataFrame =
    LogQueries.errorsByEndpoint(fct(s), "2025-11-10")

  def topEndpoints(s: SparkSession): DataFrame =
    LogQueries.topEndpoints(fct(s), "2025-11-10", 3)

  def availableDates(s: SparkSession): DataFrame =
    LogQueries.availableDates(fct(s))

  def hourlyBreakdown(s: SparkSession): DataFrame =
    LogQueries.hourlyBreakdown(fct(s), "2025-11-10")
      .withColumn("p95_bytes", round(col("p95_bytes"), 4))

  def kpiTotals(s: SparkSession): DataFrame =
    LogQueries.kpiTotals(fct(s), "2025-11-10")

  def perHourPivot(s: SparkSession): DataFrame =
    LogQueries.perHourPivot(fct(s), "2025-11-10")

  def benchErrors(s: SparkSession): DataFrame =
    LogQueries.benchErrorsByEndpoint(fct(s), "2025-11-10")

  /** Demo + oracle entry (`log_graft_lake`): the reference's core
    * layout idiom — `date=YYYY-MM-DD/` Parquet dirs
    * (`etl/ingest_logs.py:63-70`) — hosted on the VERSIONED layer:
    * the parsed staging log commits to a graft table
    * `partitionBy("date")`, and the one-day serving query reads it
    * with the date predicate pruned at the MANIFEST (per-file exact
    * partition stats). `only_matching_dirs` = 1 pins through the
    * oracle that the pruned scan touched only the wanted day's dir —
    * the log lake's partition pruning, upgraded with snapshot
    * isolation, DV deletes, and time travel for free. At 100 TB of
    * logs a one-day error rollup reads one day.
    */
  def graftLake(s: SparkSession): DataFrame = {
    import graft.sources.Snapshots
    val dir = graft.TempDirs.create("graft-log-lake")
    Snapshots.commit(LogFixture.stg(s), dir, "overwrite",
      partitionBy = Seq("date"))
    val day = java.sql.Date.valueOf("2025-11-10")
    val pruned = Snapshots.readVersionFiltered(s, dir, None,
      Seq(org.apache.spark.sql.sources.EqualTo("date", day)))
    val witness =
      if (pruned.inputFiles.forall(_.contains("date=2025-11-10"))) 1 else 0
    pruned.where(col("date") === lit(day))
      .filter(col("is_error") === 1)
      .groupBy("endpoint")
      .agg(count(lit(1)).as("errors"),
        sum(col("bytes_sent")).as("error_bytes"))
      .withColumn("only_matching_dirs", lit(witness).cast("int"))
      .orderBy("endpoint")
  }
}
