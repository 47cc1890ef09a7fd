package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Nginx "combined"-format access-log parser.
  *
  * Behavior matches the reference ETL (reference: etl/ingest_logs.py:8-30):
  *   - one record per line; blank and non-matching lines are DROPPED, not
  *     null-filled (ingest_logs.py:16-17,43-47);
  *   - the line is TRIMMED before matching and separators are `\s+`
  *     (ingest_logs.py:8-12,15 — the reference's grammar is tolerant of
  *     repeated whitespace);
  *   - the bytes field must be digits or `-` (`(?:\d+|-)`); a line with a
  *     non-numeric bytes token fails the match and is dropped
  *     (ingest_logs.py:11);
  *   - the timezone offset in the bracketed timestamp is DISCARDED before
  *     parsing (naive-timestamp semantics, ingest_logs.py:18-20);
  *   - `bytes_sent == "-"` is coerced to 0, never null (ingest_logs.py:21-22).
  *
  * ANSI safety: Spark 4 defaults `spark.sql.ansi.enabled=true`, so a plain
  * `cast`/`to_timestamp` on a garbage token would THROW instead of yielding
  * null. We (a) prefilter with `rlike` so only grammar-matching lines reach
  * the extractors, and (b) use `try_to_timestamp` for the timestamp so a
  * line whose bracketed field matches `[^\]]+` but is not a real datetime is
  * dropped rather than crashing the job.
  *
  * Implementation is pure Catalyst expressions (`regexp_extract`,
  * `try_to_timestamp`, `when`) — whole-stage-codegen'd, no UDF, fully
  * parallel over however many input splits the text scan produces. At
  * 100 TB of raw logs this is a map-only stage: no shuffle, scales linearly
  * with executors.
  */
object LogParser {

  /** Same grammar as the reference's named-group regex
    * (reference: etl/ingest_logs.py:8-12), with Java group indexes:
    * 1=ip 2=ts 3=method 4=path 5=proto 6=status 7=bytes 8=ua.
    * The referer group is non-capturing, exactly like the reference.
    */
  val LogPattern: String =
    """^(\S+)\s+\S+\s+\S+\s+\[([^\]]+)\]\s+"(\S+)\s+(\S+)\s+([^"]+)"\s+(\d{3})\s+(\d+|-)\s+"[^"]*"\s+"([^"]*)"$"""

  /** Raw lines (`value: string`) → typed parsed records.
    * Columns: client_ip, ts, method, request_path, proto, status,
    * bytes_sent, user_agent. Malformed lines dropped, never errored.
    */
  def parse(lines: DataFrame): DataFrame = {
    val v = trim(col("value"))
    // ONE regex execution per line: a builtins formulation costs eight
    // (rlike prefilter + regexp_extract per group — Catalyst shares no
    // Matcher state across expressions), and on a 100 TB raw scan the
    // regex is the dominant map-stage cost. The native expression
    // ([[graft.functions.RegexpGroups]], codegen'd) matches once and
    // returns all capture groups; its NULL-on-no-match doubles as the
    // malformed-line drop and still guarantees every downstream cast
    // sees grammar-shaped input (ANSI-safe)
    val groups = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(graft.functions.RegexpGroups(
        Bridge.expression(v), LogPattern))
    }
    def g(i: Int): Column = element_at(col("__g"), i)
    lines
      .select(groups.as("__g"))
      .filter(col("__g").isNotNull)
      .select(
        g(1).as("client_ip"),
        // TZ offset discarded: take the part before the space
        try_to_timestamp(
          substring_index(g(2), " ", 1), lit("dd/MMM/yyyy:HH:mm:ss")).as("ts"),
        g(3).as("method"),
        g(4).as("request_path"),
        g(6).cast(IntegerType).as("status"),
        when(g(7) === "-", lit("0")).otherwise(g(7)).as("bytes_raw"),
        g(8).as("user_agent")
      )
      // try_cast: a >19-digit bytes token would overflow an ANSI cast and
      // crash the job; here it becomes null and the line is dropped
      .withColumn("bytes_sent", expr("try_cast(bytes_raw AS BIGINT)"))
      .drop("bytes_raw")
      // bracketed field matched [^\]]+ but wasn't a real datetime → drop
      .filter(col("ts").isNotNull && col("bytes_sent").isNotNull)
      .select("client_ip", "ts", "method", "request_path", "status",
        "bytes_sent", "user_agent")
  }

  /** Text-file scan + parse (reference: etl/ingest_logs.py:41-47). */
  def readLogs(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
