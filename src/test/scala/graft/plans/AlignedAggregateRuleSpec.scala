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
    // DISTINCT under AVG is outside the vocabulary too
    assert(!fired("SELECT k, AVG(DISTINCT v) a FROM sqlagg_n GROUP BY k"))
    // a filter below the aggregate applies BEFORE the fold, so it
    // must mine EXACTLY into a range window — strict `>` has no
    // exact inclusive form → the planner serves
    assert(!fired("SELECT k, COUNT(*) n FROM sqlagg_n WHERE v > 5 " +
      "GROUP BY k"))
    // ... and so must a non-range predicate
    assert(!fired("SELECT k, COUNT(*) n FROM sqlagg_n " +
      "WHERE tag <> 's-1' GROUP BY k"))
    // a NON-DETERMINISTIC filter below the fold can never serve (a
    // range window replays the predicate per file; rand() would
    // sample differently) — the peel refuses it outright
    assert(!fired("SELECT k, COUNT(*) n FROM (SELECT * FROM sqlagg_n " +
      "WHERE rand() < 0.999) t GROUP BY k"))
    // two grouping columns NEITHER of which is the bucket key
    assert(!fired("SELECT tag, v, COUNT(*) n FROM sqlagg_n " +
      "GROUP BY tag, v"))
    // a grouping EXPRESSION (not a bare attribute) over the key
    assert(!fired("SELECT upper(k) ku, COUNT(*) n FROM sqlagg_n " +
      "GROUP BY upper(k)"))
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

  test("composed select lists fire (r17): casts, aggregate arithmetic, " +
    "HAVING and the CollapseProject shape keep the planner's rows and " +
    "schema") {
    val dir = freshDir()
    seed(dir)
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlagg_c")
    def parity(sql: String): Unit = {
      val got = spark.sql(sql)
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate") && !plan.contains("Exchange"),
        s"the rule must fire on: $sql\n$plan")
      val expected = try {
        spark.conf.set("graft.sql.alignedAgg.enabled", "false")
        val e = spark.sql(sql)
        assert(e.queryExecution.executedPlan.toString.contains("Aggregate"),
          s"the disable switch must restore the planner's aggregate: $sql")
        (e.schema, e.collect().map(_.toString).sorted.toSeq)
      } finally spark.conf.set("graft.sql.alignedAgg.enabled", "true")
      assert(got.schema === expected._1,
        s"composed rewrite changed the schema: $sql")
      assert(got.collect().map(_.toString).sorted.toSeq === expected._2,
        s"composed parity failed: $sql")
    }
    // casts over aggregates — the u65 analyst shape CollapseProject
    // folds into the Aggregate node
    parity("SELECT k, CAST(SUM(v) AS DOUBLE) AS sv, " +
      "CAST(COUNT(*) AS INT) AS n FROM sqlagg_c GROUP BY k")
    // aggregate arithmetic: a hand-rolled average and a reused fold
    // (SUM(v) appears twice, folded once)
    parity("SELECT k, SUM(v) / COUNT(*) AS avg_v, SUM(v) + 1 AS sv1 " +
      "FROM sqlagg_c GROUP BY k")
    // expressions over the KEY, the key under an alias, and a
    // constant column
    parity("SELECT upper(k) AS ku, k AS k2, 42 AS c, MAX(v) AS xv " +
      "FROM sqlagg_c GROUP BY k")
    // HAVING: planned as a Filter above the Aggregate — the rewrite
    // keeps the Aggregate's output attributes, so the Filter stays
    // bound and tightens the folded groups
    parity("SELECT k, COUNT(*) AS n FROM sqlagg_c GROUP BY k " +
      "HAVING COUNT(*) > 60")
    // AVG (r18, VERDICT r17 task #1): decomposed to the sum+count
    // folds with the division re-applied above — integral input →
    // double, DECIMAL input → decimal(p+4, s+4), both at the
    // planner's exact result type (the parity asserts schema too);
    // NULL v values are skipped exactly as the planner skips them
    parity("SELECT k, AVG(v) AS av FROM sqlagg_c GROUP BY k")
    parity("SELECT k, AVG(d) AS ad, COUNT(*) AS n FROM sqlagg_c " +
      "GROUP BY k")
    // composed AVG: a cast over it, arithmetic mixing it with other
    // folds, and a reused sum fold (AVG(v) shares SUM(v)'s fold)
    parity("SELECT k, CAST(AVG(v) AS DECIMAL(18,4)) AS avd, " +
      "AVG(v) + SUM(v) AS mix, SUM(v) AS sv FROM sqlagg_c GROUP BY k")
    // COMPOSITE grouping (r18): the bucket key anywhere in the
    // tuple — the rest ride the operator's groupAlso, NULLs in both
    // columns group per SQL
    parity("SELECT k, tag, COUNT(*) AS n, SUM(v) AS sv FROM sqlagg_c " +
      "GROUP BY k, tag")
    parity("SELECT tag, k, COUNT(*) AS n FROM sqlagg_c GROUP BY tag, k")
    parity("SELECT tag, k, AVG(v) AS av, MAX(d) AS xd FROM sqlagg_c " +
      "GROUP BY tag, k")
    // DataFrame-composed casts + orderBy over the SQL frame — the
    // exact u65 entry shape (the r16 weak item): the final frame's
    // OWN plan must carry the fold, not the planner's shuffle
    val composed = spark.sql(
        "SELECT k, COUNT(*) AS n, SUM(d) AS total FROM sqlagg_c GROUP BY k")
      .select(col("k"), col("n"), col("total").cast("double").as("total"))
      .orderBy("k")
    val cPlan = composed.queryExecution.executedPlan.toString
    assert(!cPlan.contains("HashAggregate"),
      s"the composed final frame must ride the fold:\n$cPlan")
    val cExp = try {
      spark.conf.set("graft.sql.alignedAgg.enabled", "false")
      spark.sql("SELECT k, COUNT(*) AS n, SUM(d) AS total FROM sqlagg_c " +
          "GROUP BY k")
        .select(col("k"), col("n"), col("total").cast("double").as("total"))
        .orderBy("k").collect().map(_.toString).toSeq
    } finally spark.conf.set("graft.sql.alignedAgg.enabled", "true")
    assert(composed.collect().map(_.toString).toSeq === cExp)
  }

  test("exact filter-through fires (r17): BETWEEN and equality " +
    "conjuncts ride the fold's range window with planner parity") {
    val dir = freshDir()
    val s = spark
    import s.implicits._
    // two range-sliced commits with stats so the window also prunes
    // files; NULLs in the filter column exercise BETWEEN's NULL drop
    Seq((0, 450), (450, 900)).zipWithIndex.foreach { case ((lo, hi), i) =>
      val df = (lo until hi).map { j =>
        (s"k-${j % 13}",
          if (j % 7 == 0) null.asInstanceOf[java.lang.Long]
          else java.lang.Long.valueOf(j.toLong),
          s"s-${j % 5}")
      }.toDF("k", "v", "tag").coalesce(1)
      Snapshots.commit(df, dir, if (i == 0) "overwrite" else "append",
        bucketBy = Some(("k", 4)), statsColumns = Seq("v"))
    }
    // clustered appends keep every file bucketed; re-cluster to be
    // safe for the aligned precondition
    Snapshots.compactBucketed(spark, dir, "k", 4, statsColumns = Seq("v"))
    spark.read.format("graft").load(dir).createOrReplaceTempView("sqlagg_f")
    def parity(sql: String): Unit = {
      val got = spark.sql(sql)
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("HashAggregate") && !plan.contains("Exchange"),
        s"the rule must fire on: $sql\n$plan")
      val expected = try {
        spark.conf.set("graft.sql.alignedAgg.enabled", "false")
        spark.sql(sql).collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("graft.sql.alignedAgg.enabled", "true")
      assert(expected.nonEmpty, s"vacuous filtered parity: $sql")
      assert(got.collect().map(_.toString).sorted.toSeq === expected,
        s"filtered parity failed: $sql")
    }
    // BETWEEN on a value column: σ before the fold, exact
    parity("SELECT k, COUNT(*) AS n, SUM(v) AS sv FROM sqlagg_f " +
      "WHERE v BETWEEN 100 AND 600 GROUP BY k")
    // equality window + a composed select list together
    parity("SELECT k, CAST(SUM(v) AS DOUBLE) AS sv FROM sqlagg_f " +
      "WHERE tag = 's-2' GROUP BY k")
    // window on the KEY column itself (groups outside drop)
    parity("SELECT k, COUNT(*) AS n FROM sqlagg_f " +
      "WHERE k BETWEEN 'k-2' AND 'k-6' GROUP BY k")
  }
}
