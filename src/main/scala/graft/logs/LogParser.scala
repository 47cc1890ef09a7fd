package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Nginx "combined"-format access-log parser.
  *
  * Behavior matches the reference ETL (reference: etl/ingest_logs.py:8-30):
  *   - one record per line; blank and non-matching lines are DROPPED, not
  *     null-filled (ingest_logs.py:16-17,43-47);
  *   - the timezone offset in the bracketed timestamp is DISCARDED before
  *     parsing (naive-timestamp semantics, ingest_logs.py:18-20);
  *   - `bytes_sent == "-"` is coerced to 0, never null (ingest_logs.py:21-22).
  *
  * Implementation is pure Catalyst expressions (`regexp_extract`,
  * `to_timestamp`, `when`) — whole-stage-codegen'd, no UDF, fully
  * parallel over however many input splits the text scan produces. At
  * 100 TB of raw logs this is a map-only stage: no shuffle, scales linearly
  * with executors.
  */
object LogParser {

  /** Same grammar as the reference's named-group regex
    * (reference: etl/ingest_logs.py:8-12), with Java group indexes:
    * 1=ip 2=ts 3=method 4=path 5=proto 6=status 7=bytes 8=referer 9=ua.
    */
  val LogPattern: String =
    """^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\S+) "([^"]*)" "([^"]*)"\s*$"""

  private def g(c: Column, i: Int): Column = regexp_extract(c, LogPattern, i)

  /** Raw lines (`value: string`) → typed parsed records.
    * Columns: client_ip, ts, method, request_path, proto, status,
    * bytes_sent, user_agent. Malformed lines dropped.
    */
  def parse(lines: DataFrame): DataFrame = {
    val v = col("value")
    lines
      .filter(trim(v) =!= "")
      // one regexp_extract per field; the regex literal is shared so
      // codegen compiles/caches a single Pattern per task
      .select(
        g(v, 1).as("client_ip"),
        // TZ offset discarded: take the part before the space
        to_timestamp(substring_index(g(v, 2), " ", 1), "dd/MMM/yyyy:HH:mm:ss").as("ts"),
        g(v, 3).as("method"),
        g(v, 4).as("request_path"),
        g(v, 6).cast(IntegerType).as("status"),
        when(g(v, 7) === "-", lit(0L)).otherwise(g(v, 7).cast(LongType)).as("bytes_sent"),
        g(v, 9).as("user_agent")
      )
      // regexp_extract returns "" on non-match → status cast yields null →
      // drop the malformed line (reference drops, never errors)
      .filter(col("status").isNotNull && col("ts").isNotNull)
  }

  /** Text-file scan + parse (reference: etl/ingest_logs.py:41-47). */
  def readLogs(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
