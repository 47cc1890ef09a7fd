package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's golden 7-line log fixture, embedded so the whole
  * raw-line → stg → fact lineage is exercised by every correctness run
  * (reference: data/raw/nginx_access.log:1-7, documented README.md:96-100).
  * Covers 2 dates, 3 client IPs, 4 endpoints, statuses {200,304,401,500,503},
  * a bytes=0 row, query-string paths, and two user agents.
  */
object LogFixture {

  val lines: Seq[String] = Seq(
    """127.0.0.1 - - [10/Nov/2025:10:21:34 +0530] "GET /api/v1/items?id=42 HTTP/1.1" 200 1234 "-" "Mozilla/5.0"""",
    """127.0.0.1 - - [10/Nov/2025:10:22:01 +0530] "GET /api/v1/items?id=42 HTTP/1.1" 304 0 "-" "Mozilla/5.0"""",
    """127.0.0.1 - - [10/Nov/2025:11:01:12 +0530] "POST /auth/login HTTP/1.1" 401 512 "-" "Mozilla/5.0"""",
    """192.168.1.9 - - [10/Nov/2025:11:17:45 +0530] "GET /health HTTP/1.1" 200 8 "-" "curl/8.1.2"""",
    """192.168.1.9 - - [10/Nov/2025:12:05:55 +0530] "GET /api/v1/items?id=77 HTTP/1.1" 500 256 "-" "curl/8.1.2"""",
    """127.0.0.1 - - [11/Nov/2025:10:01:01 +0530] "GET /api/v1/items?id=88 HTTP/1.1" 200 777 "-" "Mozilla/5.0"""",
    """127.0.0.1 - - [11/Nov/2025:12:59:59 +0530] "GET /health HTTP/1.1" 503 16 "-" "curl/8.1.2""""
  )

  /** Raw fixture as a one-column `value: string` frame — the same shape
    * `spark.read.text` produces, so the full parse path is identical.
    */
  def raw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(lines).toDF("value")
  }

  /** Parsed → staging model over the fixture. */
  def stg(spark: SparkSession): DataFrame =
    LogModels.stgLogs(LogParser.parse(raw(spark)))

  /** Hourly fact over the fixture. */
  def fct(spark: SparkSession): DataFrame =
    LogModels.fctRequestsHourly(stg(spark))
}
