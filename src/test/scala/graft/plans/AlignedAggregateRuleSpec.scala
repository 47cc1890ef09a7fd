package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The SQL→storage-partitioned-aggregation rewrite
  * ([[AlignedAggregate]]): `GROUP BY <bucket key>` over a
  * bucket-clustered graft table executes as the zero-Exchange
  * per-bucket fold, with the planner's exact rows, types and NULL
  * semantics — and never fires outside its narrow shape.
  */
class AlignedAggregateRuleSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-sqlagg")

  private def seed(dir: String): Unit = {
    val s = spark
    import s.implicits._
    // NULL keys (one SQL group), NULL values (skipped by sum/min/max),
    // decimal + long + string columns to pin result types
    val df = (0 until 900).map { i =>
      (if (i % 31 == 0) null else s"k-${i % 13}",
        if (i % 7 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(i.toLong),
        BigDecimal(i).setScale(2),
        s"s-${i % 5}")
    }.toDF("k", "v", "d", "tag").coalesce(1)
    Snapshots.commit(df, dir, "overwrite", bucketBy = Some(("k", 4)))
  }

  test("fires on GROUP BY the bucket key: no exchange below the scan, " +
    "rows and types equal the planner, NULL groups exact") {
    val dir = freshDir()
    seed(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlagg_t")
    val sql = "SELECT k, COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS sv, " +
      "MIN(tag) AS mt, MAX(v) AS xv, SUM(d) AS sd " +
      "FROM sqlagg_t GROUP BY k"
    val got = spark.sql(sql)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Exchange"),
      s"the rule must replace the planner's aggregate:\n$plan")
    val expected = try {
      spark.conf.set("graft.sql.alignedAgg.enabled", "false")
      val e = spark.sql(sql)
      assert(e.queryExecution.executedPlan.toString.contains("Aggregate"),
        "the disable switch must restore the planner's aggregate")
      e
    } finally spark.conf.set("graft.sql.alignedAgg.enabled", "true")
    assert(got.schema === expected.schema,
      "the rewrite must keep the planner's result schema exactly")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "sql aligned aggregate parity")
    // select-list order permutations re-project; key may be absent
    val perm = spark.sql(
      "SELECT COUNT(*) AS n, SUM(v) AS sv FROM sqlagg_t GROUP BY k")
    assert(!perm.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val permExp = try {
      spark.conf.set("graft.sql.alignedAgg.enabled", "false")
      spark.sql("SELECT COUNT(*) AS n, SUM(v) AS sv FROM sqlagg_t " +
        "GROUP BY k").collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("graft.sql.alignedAgg.enabled", "true")
    assert(perm.collect().map(_.toString).sorted.toSeq === permExp)
  }

  test("never fires outside the shape: non-key grouping, DISTINCT, " +
    "avg, filtered child, unclustered tail — planner rows serve") {
    val dir = freshDir()
    seed(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlagg_n")
    def fired(sql: String): Boolean = {
      val p = spark.sql(sql).queryExecution.executedPlan.toString
      !p.contains("HashAggregate") && !p.contains("SortAggregate") &&
        !p.contains("ObjectHashAggregate")
    }
    // grouping by a NON-bucket column
    assert(!fired("SELECT tag, COUNT(*) n FROM sqlagg_n GROUP BY tag"))
    // DISTINCT aggregate
    assert(!fired("SELECT k, COUNT(DISTINCT v) n FROM sqlagg_n GROUP BY k"))
    // avg is outside the aligned vocabulary
    assert(!fired("SELECT k, AVG(v) a FROM sqlagg_n GROUP BY k"))
    // a filter below the aggregate cannot hoist above a fold
    assert(!fired("SELECT k, COUNT(*) n FROM sqlagg_n WHERE v > 5 " +
      "GROUP BY k"))
    // two grouping columns
    assert(!fired("SELECT k, tag, COUNT(*) n FROM sqlagg_n " +
      "GROUP BY k, tag"))
    // an unclustered tail refuses alignment (planner serves)
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq(("k-1", 5L, BigDecimal(1).setScale(2), "s-1"))
      .toDF("k", "v", "d", "tag"), dir, "append")
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlagg_u")
    assert(!fired("SELECT k, COUNT(*) n FROM sqlagg_u GROUP BY k"))
    assert(spark.sql("SELECT k, COUNT(*) n FROM sqlagg_u GROUP BY k")
      .count() > 0)
  }
}
