package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's serving-layer queries (FastAPI + Streamlit), as
  * parameterized DataFrame functions over the hourly fact. All of them
  * scan the pre-aggregated fact — the same "serve from the rollup, not
  * the raw lake" design the reference uses, which is also the right call
  * at 100 TB (the fact is orders of magnitude smaller than staging).
  */
object LogQueries {

  private val DatePattern = """^\d{4}-\d{2}-\d{2}$""".r

  /** Serve-time parameter validation (reference: serve/api.py:26-29,
    * 56-59 rejects malformed dates with HTTP 400; here: IllegalArgument
    * before any Spark job is launched). Checks shape AND calendar
    * validity, like the reference's strptime.
    */
  def validateDate(date: String): Unit = {
    require(DatePattern.matches(date), s"invalid date format: '$date' (want YYYY-MM-DD)")
    try java.time.LocalDate.parse(date)
    catch { case _: java.time.format.DateTimeParseException =>
      throw new IllegalArgumentException(s"invalid calendar date: '$date'")
    }
  }

  /** Bounds check for top-k limits (reference: serve/api.py:53). */
  def validateLimit(k: Int): Unit =
    require(k >= 1 && k <= 100, s"limit must be in [1,100], got $k")

  /** GET /errors_by_endpoint?date=… (reference: serve/api.py:33-41).
    * Equality filter on the partition-style date column → partition
    * pruning when the fact is stored partitioned by date.
    */
  def errorsByEndpoint(fct: DataFrame, date: String): DataFrame = {
    validateDate(date)
    fct
      .filter(col("date") === lit(date))
      .groupBy("endpoint")
      .agg(sum("errors").as("errors"), sum("requests").as("requests"))
      .orderBy(desc("errors"), desc("requests"), asc("endpoint"))
  }

  /** GET /top_endpoints?date=…&limit=k (reference: serve/api.py:63-72).
    * orderBy+limit plans as TakeOrderedAndProject — a true distributed
    * top-k (per-partition heap + driver merge), no full sort at scale.
    */
  def topEndpoints(fct: DataFrame, date: String, k: Int): DataFrame = {
    validateDate(date)
    validateLimit(k)
    fct
      .filter(col("date") === lit(date))
      .groupBy("endpoint")
      .agg(sum("requests").as("requests"), sum("errors").as("errors"))
      .orderBy(desc("requests"), desc("errors"), asc("endpoint"))
      .limit(k)
  }

  /** Dashboard date picker (reference: serve/app.py:23). */
  def availableDates(fct: DataFrame): DataFrame =
    fct.select("date").distinct().orderBy("date")

  /** Dashboard hourly table (reference: serve/app.py:31-36). */
  def hourlyBreakdown(fct: DataFrame, date: String): DataFrame = {
    validateDate(date)
    fct.filter(col("date") === lit(date)).orderBy("hour", "endpoint")
  }

  /** Dashboard KPI row: day totals + derived error-rate %
    * (reference: serve/app.py:63-65).
    */
  def kpiTotals(fct: DataFrame, date: String): DataFrame = {
    validateDate(date)
    fct
      .filter(col("date") === lit(date))
      .agg(sum("requests").as("total_requests"), sum("errors").as("total_errors"))
      .withColumn(
        "error_rate_pct",
        when(col("total_requests") > 0,
          col("total_errors") / col("total_requests") * 100.0).otherwise(lit(0.0))
      )
  }

  /** Dashboard per-hour chart re-group (reference: serve/app.py:77-81). */
  def perHourPivot(fct: DataFrame, date: String): DataFrame = {
    validateDate(date)
    fct
      .filter(col("date") === lit(date))
      .groupBy("hour")
      .agg(sum("errors").as("errors"), sum("requests").as("requests"))
      .orderBy("hour")
  }

  /** Benchmark query (reference: README.md:202-205). */
  def benchErrorsByEndpoint(fct: DataFrame, date: String): DataFrame = {
    validateDate(date)
    fct
      .filter(col("date") === lit(date))
      .groupBy("endpoint")
      .agg(sum("errors").as("errors"))
      .orderBy(desc("errors"), asc("endpoint"))
  }
}
