package graft.logs

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame

/** The reference's always-on serving process (`serve/api.py:19-76`:
  * FastAPI over the warehouse) re-expressed over the Spark session —
  * a minimal JDK-built-in HTTP loop (zero dependencies) around
  * [[LogQueries]], serving the SAME endpoints with the same
  * parameter/validation/ordering contract:
  *
  *   - `GET /health` → `{"status":"ok", ...}`
  *   - `GET /errors_by_endpoint?date=YYYY-MM-DD`
  *   - `GET /top_endpoints?date=YYYY-MM-DD&limit=k` (k in [1,100],
  *     default 10)
  *
  * Bad parameters → 400 with a JSON error (the reference's
  * HTTPException contract); unknown paths → 404; a query failure →
  * 500. Serving scans the pre-aggregated hourly fact, NOT the raw
  * lake — the reference's "serve from the rollup" design, which is
  * also the only sane shape at 100 TB (the fact is orders of
  * magnitude smaller, and the date filter prunes it further). The
  * fact is provided as a THUNK so callers choose the freshness
  * policy: a cached DataFrame for a frozen snapshot, a
  * read-per-request for a live graft table (manifest resolution is
  * O(1) per request).
  *
  * Deliberately NOT a cluster component: like the reference's
  * uvicorn process, this runs wherever the driver runs; the heavy
  * lifting stays in Spark jobs.
  */
final class LogServer(fct: () => DataFrame, port: Int = 0) {

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful when constructed with port 0 = ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    try x.getResponseBody.write(bytes) finally x.close()
  }

  private def params(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getRawQuery).fold(Map.empty[String, String]) { q =>
      q.split('&').iterator.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }.toMap
    }

  /** 400 on validation failures, 500 on anything else — the
    * reference's exception mapping.
    */
  private def serve(x: HttpExchange)(body: => String): Unit =
    try respond(x, 200, body)
    catch {
      case e: IllegalArgumentException =>
        // String.valueOf: a null-message exception must not NPE inside
        // the catch (the exchange would never close)
        respond(x, 400, s"""{"detail":"${esc(String.valueOf(e.getMessage))}"}""")
      case scala.util.control.NonFatal(e) =>
        respond(x, 500, s"""{"detail":"${esc(String.valueOf(e.getMessage))}"}""")
    }

  server.createContext("/health", (x: HttpExchange) =>
    serve(x)("""{"status":"ok","engine":"graft-spark"}"""))

  server.createContext("/errors_by_endpoint", (x: HttpExchange) => serve(x) {
    val date = params(x).getOrElse("date",
      throw new IllegalArgumentException("date is required"))
    val rows = LogQueries.errorsByEndpoint(fct(), date).collect().map { r =>
      s"""{"endpoint":"${esc(r.getAs[String]("endpoint"))}"""" +
        s""","errors":${r.getAs[Long]("errors")}""" +
        s""","requests":${r.getAs[Long]("requests")}}"""
    }
    s"""{"date":"${esc(date)}","rows":[${rows.mkString(",")}]}"""
  })

  server.createContext("/top_endpoints", (x: HttpExchange) => serve(x) {
    val ps = params(x)
    val date = ps.getOrElse("date",
      throw new IllegalArgumentException("date is required"))
    val limit = ps.get("limit").map { s =>
      try s.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"limit must be an integer: '$s'") }
    }.getOrElse(10)
    val rows = LogQueries.topEndpoints(fct(), date, limit).collect().map { r =>
      s"""{"endpoint":"${esc(r.getAs[String]("endpoint"))}"""" +
        s""","requests":${r.getAs[Long]("requests")}""" +
        s""","errors":${r.getAs[Long]("errors")}}"""
    }
    s"""{"date":"${esc(date)}","rows":[${rows.mkString(",")}]}"""
  })

  server.createContext("/", (x: HttpExchange) =>
    respond(x, 404, """{"detail":"not found"}"""))

  def start(): LogServer = { server.start(); this }

  def stop(): Unit = server.stop(0)
}

/** `runMain graft.logs.LogServe <fctParquetDirOrGraftTable> [port]` —
  * the standalone serving process (the reference's
  * `uvicorn serve.api:app`). Reads the hourly fact once (a parquet
  * dir or a graft table dir with `_manifests/`) and serves until
  * killed.
  */
object LogServe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LogServe <fctDir> [port]")
    val dir = args(0)
    val port = if (args.length > 1) args(1).toInt else 8080
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt).getOrCreate()
    val isGraft = new org.apache.hadoop.fs.Path(dir, "_manifests")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(dir, "_manifests"))
    val fct = () =>
      if (isGraft) spark.read.format("graft").load(dir)
      else spark.read.parquet(dir)
    val srv = new LogServer(fct, port).start()
    System.err.println(s"[graft-serve] listening on ${srv.boundPort}")
    Thread.currentThread().join() // serve until killed
  }
}
