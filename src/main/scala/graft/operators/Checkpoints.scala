package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared checkpoint policy for iterative/self-joined operators
  * (dedup clustering, shingle reuse, PageRank): one switch decides
  * between fast executor-pinned `localCheckpoint()` and fault-tolerant
  * `checkpoint()` for every operator, so a cluster deployment flips
  * ONE config instead of auditing call sites.
  */
private[graft] object Checkpoints {

  /** Materialize a frame, truncating lineage. Default is
    * `localCheckpoint()` — blocks pinned to executors, fastest, but an
    * executor loss kills the job because the truncated lineage cannot
    * be recomputed. Fine in local[*]; on a real cluster running a
    * long iterative job, set `spark.graft.reliableCheckpoint=true` to
    * route through fault-tolerant `checkpoint()` (files under
    * `spark.graft.checkpointDir`, or a temp dir), which survives
    * executor loss at the cost of a write to storage per round.
    *
    * Cleanup expectation in reliable mode: checkpoint files are
    * reclaimed by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
    * otherwise they persist past the session — deployments should set
    * `spark.graft.checkpointDir` to a managed location (the fallback
    * temp dir is per-session and is NOT auto-deleted, by design: a
    * crashed job's operator state stays inspectable).
    */
  def persistFrame(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    // common truthy/falsy spellings accepted; anything else FAILS
    // FAST — a typo ("ture") silently reading as false would strip
    // the fault tolerance the deployment explicitly opted into, and
    // only surface at the first executor loss
    val reliable = s.conf.getOption("spark.graft.reliableCheckpoint")
      .map(_.toLowerCase) match {
      case None => false
      case Some("true" | "1" | "yes" | "on") => true
      case Some("false" | "0" | "no" | "off") => false
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.reliableCheckpoint=$other (want true/false)")
    }
    if (reliable) {
      if (s.sparkContext.getCheckpointDir.isEmpty)
        s.sparkContext.setCheckpointDir(
          s.conf.getOption("spark.graft.checkpointDir").getOrElse(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString))
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** Drop the block-manager blocks behind a localCheckpointed frame.
    * A checkpointed Dataset's analyzed plan is a single LogicalRDD over
    * the persisted RDD; unpersisting it frees the blocks immediately.
    * ONLY safe once the frame will never be read again — the truncated
    * lineage cannot be recomputed. (For a reliable `checkpoint()` the
    * RDD is file-backed and unpersist is a harmless no-op; the files
    * are cleaned by the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set, or at
    * application end.)
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }
}
