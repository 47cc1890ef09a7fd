package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The SQL→storage-partitioned running-window rewrite
  * ([[AlignedRunning]], r18): `agg OVER (PARTITION BY <bucket key>
  * ORDER BY t)` — SQL's default RANGE frame — executes as the
  * zero-Exchange per-bucket streaming fold, with the planner's exact
  * rows, types, tie (peer) semantics and NULL handling — and never
  * fires outside its narrow shape.
  */
class AlignedRunningRuleSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-sqlrun")

  private def seed(dir: String, sorted: Boolean): Unit = {
    val s = spark
    import s.implicits._
    // NULL keys (one window partition), NULL order values (peers,
    // sort first), NULL agg values (skipped), heavy ties
    val df = (0 until 600).map { i =>
      (if (i % 50 == 0) null else java.lang.Long.valueOf(i.toLong % 11),
        if (i % 37 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf((i / 7).toLong),
        if (i % 5 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(i.toLong),
        BigDecimal(i).setScale(2))
    }.toDF("k", "t", "v", "d")
    Snapshots.commit(df, dir, "overwrite", bucketBy = Some(("k", 4)),
      sortBuckets = sorted, sortAlso = if (sorted) Seq("t") else Nil)
  }

  private def parity(sql: String, mustFire: Boolean): Unit = {
    val q = spark.sql(sql)
    val plan = q.queryExecution.executedPlan.toString
    val fired = !plan.contains("Window") && !plan.contains("Exchange")
    assert(fired === mustFire, s"fired=$fired, expected $mustFire: $sql\n" +
      (if (fired != mustFire) plan else ""))
    val got = q.collect().map(_.toString).sorted.toSeq
    val (expRows, expSchema) = try {
      spark.conf.set("graft.sql.alignedRunning.enabled", "false")
      val e = spark.sql(sql)
      (e.collect().map(_.toString).sorted.toSeq, e.schema)
    } finally spark.conf.set("graft.sql.alignedRunning.enabled", "true")
    assert(expRows.nonEmpty, s"vacuous running parity: $sql")
    assert(q.schema === expSchema, s"running rewrite changed schema: $sql")
    assert(got === expRows, s"running parity failed: $sql")
  }

  test("fires on the default-frame running window over the bucket " +
    "key: no Window operator, no Exchange, planner rows/types/ties " +
    "exact incl. NULL keys, orders and values") {
    val dir = freshDir()
    seed(dir, sorted = false)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlrun_t")
    parity("SELECT k, t, v, COUNT(*) OVER w AS rn, SUM(v) OVER w AS rs, " +
      "MAX(v) OVER w AS rx, SUM(d) OVER w AS rd FROM sqlrun_t " +
      "WINDOW w AS (PARTITION BY k ORDER BY t)", mustFire = true)
    // the explicit default frame spells out what the bare ORDER BY
    // means — same rewrite
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t RANGE " +
      "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs " +
      "FROM sqlrun_t", mustFire = true)
  }

  test("a composite-sorted layout serves the running rewrite with " +
    "zero Sort; exactly-minable filters ride the range window") {
    val dir = freshDir()
    seed(dir, sorted = true)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlrun_s")
    val sql = "SELECT k, t, COUNT(*) OVER w AS rn, SUM(v) OVER w AS rs " +
      "FROM sqlrun_s WINDOW w AS (PARTITION BY k ORDER BY t)"
    val q = spark.sql(sql)
    assert(Snapshots.alignedSortFree(q),
      "the sorted layout must serve the running fold sort-free:\n" +
        q.queryExecution.executedPlan.toString)
    parity(sql, mustFire = true)
    // σ below the window defines the window's input — served only
    // when it mines EXACTLY (BETWEEN); the subquery keeps the Filter
    // under the Window
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t) AS rs " +
      "FROM (SELECT * FROM sqlrun_s WHERE t BETWEEN 10 AND 60) x",
      mustFire = true)
    // a non-minable filter bails to the planner
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t) AS rs " +
      "FROM (SELECT * FROM sqlrun_s WHERE v <> 7) x", mustFire = false)
  }

  test("never fires outside the shape: ROWS/bounded frames, descending " +
    "order, non-key partition, rank-family functions, AVG, " +
    "unclustered tail — the planner serves") {
    val dir = freshDir()
    seed(dir, sorted = false)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlrun_n")
    // ROWS framing is physical-order-dependent — not the operator's
    // peer semantics
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t ROWS " +
      "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs " +
      "FROM sqlrun_n", mustFire = false)
    // a bounded frame
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t RANGE " +
      "BETWEEN 5 PRECEDING AND CURRENT ROW) AS rs FROM sqlrun_n",
      mustFire = false)
    // descending order
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t DESC) " +
      "AS rs FROM sqlrun_n", mustFire = false)
    // partitioned by a NON-bucket column
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY v ORDER BY t) AS rs " +
      "FROM sqlrun_n", mustFire = false)
    // rank-family window functions are not running folds
    parity("SELECT k, t, ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) " +
      "AS rn FROM sqlrun_n", mustFire = false)
    // AVG over a running window stays with the planner (for now)
    parity("SELECT k, t, AVG(v) OVER (PARTITION BY k ORDER BY t) AS av " +
      "FROM sqlrun_n", mustFire = false)
    // an unclustered tail refuses alignment
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, 999L, 5L, BigDecimal(1).setScale(2)))
      .toDF("k", "t", "v", "d"), dir, "append")
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlrun_u")
    parity("SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t) AS rs " +
      "FROM sqlrun_u", mustFire = false)
  }
}
