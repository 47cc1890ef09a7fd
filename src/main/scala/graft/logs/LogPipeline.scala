package graft.logs

import org.apache.spark.sql.{SaveMode, SparkSession}

/** End-to-end pipeline main, mirroring the reference's orchestrated flow
  * (reference: orchestration/flow.py:29-35 — etl → dbt run → dbt test):
  *
  *   raw log file → parse (drop malformed) → ingest asserts →
  *   date-partitioned lake → stg → dims + hourly fact persisted as
  *   parquet tables (closes the S6 materialization gap) → quality gate.
  *
  * One command produces the queryable warehouse; serving queries
  * (LogQueries) then read the small persisted fact, not the raw lake —
  * at 100 TB the fact is orders of magnitude smaller than staging, and
  * partition pruning on `date` keeps serve-time scans to one day.
  */
object LogPipeline {

  /** The flow: named tasks with per-task retry + checkpointed resume
    * (reference: `orchestration/flow.py:13-35`, where Prefect's @task
    * gives each step retries/observability). Task bodies are
    * idempotent (overwrite writes), so a retry or a resumed re-run
    * can never double-apply. Returns the flow's task report.
    */
  def run(spark: SparkSession, rawPath: String, warehouseDir: String,
          resume: Boolean = false): Seq[(String, String, Int)] = {
    val flow = new graft.Flow("log-warehouse",
      stateDir = Some(warehouseDir),
      maxRetries = sys.env.getOrElse("GRAFT_FLOW_RETRIES", "2").toInt)
    if (!resume) flow.clearState()

    // 1. ETL (reference: ingest_logs.py main) — the parse is PINNED
    // once: the ingest asserts take two actions and the lake write a
    // third, and without the persist each re-executes the raw text
    // scan + regex parse, tripling the pipeline's dominant stage
    flow.task("etl") {
      val parsed = LogParser.readLogs(spark, rawPath)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        LogQuality.assertIngest(parsed)
        val stg = LogModels.stgLogs(parsed)
        LogLake.writePartitioned(stg, s"$warehouseDir/lake")
      } finally parsed.unpersist(false)
    }

    // 2. Model build from the lake (reference: dbt run) — read back so
    // downstream models consume the persisted, partition-pruned lake
    flow.task("models") {
      val lakeStg = LogLake.readLake(spark, s"$warehouseDir/lake")
      def persist(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        df.write.mode(SaveMode.Overwrite).parquet(s"$warehouseDir/$name")
      persist("dim_client", LogModels.dimClient(lakeStg))
      persist("dim_endpoint", LogModels.dimEndpoint(lakeStg))
      persist("fct_requests_hourly", LogModels.fctRequestsHourly(lakeStg))
    }

    // 3. Quality gate (reference: dbt test) — fail the run on
    // violations. NOT resume-skippable by design: a resumed flow must
    // still prove the warehouse it leaves behind passes the contract,
    // so the gate re-runs even when steps 1-2 were skipped.
    val lakeStg = LogLake.readLake(spark, s"$warehouseDir/lake")
    val fct = spark.read.parquet(s"$warehouseDir/fct_requests_hourly")
    val violations = LogQuality.runAll(lakeStg, fct).filter(_._2 > 0)
    require(violations.isEmpty, s"quality checks failed: $violations")

    flow.report.map(r => (r.task, r.status, r.attempts))
  }

  /** CLI: LogPipeline <raw log path> <warehouse dir> */
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: LogPipeline <raw log path> <warehouse dir>")
      sys.exit(2)
    }
    val Array(raw, wh) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, raw, wh)
    spark.stop()
  }
}
