package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots

/** The fused SQL star-query rewrite ([[AlignedJoinAggregate]], r17):
  * `GROUP BY <join key>` over a co-clustered graft⋈graft inner
  * equi-join executes join AND fold in one task — the executed plan
  * carries no join operator, no aggregate operator and no Exchange at
  * all. Every leg checks rows against the planner (both rules
  * disabled), because the rewrite's contract is strategy-only; the
  * never-fire legs also pin the FALLBACK layering (the plain
  * [[AlignedJoin]] rewrite plus the planner's aggregate).
  */
class AlignedJoinAggRuleSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-sqlfused")

  private def mk(rows: Int, key: String, tag: String,
                 dupCol: Boolean = false): String = {
    val s = spark
    import s.implicits._
    val dir = freshDir()
    val base = (0 until rows)
      .map(i => (i.toLong % 97, i.toLong, s"$tag-$i"))
      .toDF(key, s"v_$tag", s"s_$tag")
    val df = if (dupCol) base.withColumn("dup",
      org.apache.spark.sql.functions.col(s"v_$tag") * 2) else base
    Snapshots.commit(df, dir, "overwrite", bucketBy = Some((key, 4)))
    dir
  }

  private def view(dir: String, name: String): Unit =
    spark.read.format("graft").load(dir).createOrReplaceTempView(name)

  private def plannerRows(sql: String): (Seq[String],
      org.apache.spark.sql.types.StructType) =
    try {
      spark.conf.set("graft.sql.alignedJoinAgg.enabled", "false")
      spark.conf.set("graft.sql.alignedJoin.enabled", "false")
      val p = spark.sql(sql)
      assert(p.queryExecution.executedPlan.toString.contains("Join"),
        s"the disable switches must restore the planner: $sql")
      (p.collect().map(_.toString).sorted.toSeq, p.schema)
    } finally {
      spark.conf.set("graft.sql.alignedJoinAgg.enabled", "true")
      spark.conf.set("graft.sql.alignedJoin.enabled", "true")
    }

  test("fires on GROUP BY the join key: no join, no aggregate, no " +
    "Exchange anywhere — composed select lists included, planner " +
    "rows and schema exact") {
    val l = mk(500, "k", "l"); val r = mk(300, "rk", "r")
    view(l, "fus_l"); view(r, "fus_r")
    def fusedCheck(sql: String): Unit = {
      val q = spark.sql(sql)
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Join") && !p.contains("Aggregate") &&
        !p.contains("Exchange"),
        s"the fused rewrite must serve end to end: $sql\n$p")
      val (exp, expSchema) = plannerRows(sql)
      assert(exp.nonEmpty)
      assert(q.schema === expSchema, s"fused schema drift: $sql")
      assert(q.collect().map(_.toString).sorted.toSeq === exp,
        s"fused parity failed: $sql")
    }
    fusedCheck("SELECT k, COUNT(*) AS n, SUM(v_r) AS sv " +
      "FROM fus_l JOIN fus_r ON k = rk GROUP BY k")
    // composed select list: cast + arithmetic over the folds
    fusedCheck("SELECT k, CAST(SUM(v_l) AS DOUBLE) / COUNT(*) AS avg_l, " +
      "MAX(s_r) AS ms FROM fus_l JOIN fus_r ON k = rk GROUP BY k")
    // grouping by the RIGHT side's key attribute (equal on an inner
    // equi-join, both sides drop NULL keys — same groups)
    fusedCheck("SELECT rk, COUNT(*) AS n " +
      "FROM fus_l JOIN fus_r ON k = rk GROUP BY rk")
    // the WINDOWED star query (r17): exactly-minable BETWEEN/equality
    // conjuncts on either side ride the fused operator's pre-join
    // range windows — σ before the fold, still zero Exchange
    fusedCheck("SELECT k, COUNT(*) AS n, SUM(v_r) AS sv " +
      "FROM fus_l JOIN fus_r ON k = rk " +
      "WHERE v_l BETWEEN 50 AND 400 AND v_r BETWEEN 0 AND 250 GROUP BY k")
    // AVG (r18): decomposed to sum+count folds, the division
    // re-applied above the fused replacement at the planner's type
    fusedCheck("SELECT k, AVG(v_l) AS al, AVG(v_r) AS ar, " +
      "SUM(v_r) AS sv FROM fus_l JOIN fus_r ON k = rk GROUP BY k")
  }

  test("falls back in layers: filtered sides, non-key grouping and " +
    "ambiguous agg columns take the plain join rewrite + planner " +
    "aggregate; mismatched layouts take the full planner") {
    val l = mk(400, "k", "a", dupCol = true)
    val r = mk(200, "rk", "b", dupCol = true)
    val r8 = {
      val s = spark
      import s.implicits._
      val dir = freshDir()
      Snapshots.commit((0 until 200).map(i => (i.toLong % 97, i.toLong))
        .toDF("rk", "v_b8"), dir, "overwrite", bucketBy = Some(("rk", 8)))
      dir
    }
    view(l, "fusn_l"); view(r, "fusn_r"); view(r8, "fusn_r8")
    def shape(sql: String): (Boolean, Boolean) = {
      val p = spark.sql(sql).queryExecution.executedPlan.toString
      (p.contains("Join"), p.contains("Aggregate"))
    }
    def parityOnly(sql: String): Unit = {
      val got = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got === plannerRows(sql)._1,
        s"fallback parity failed: $sql")
    }
    // a NON-minable WHERE (strict `>` has no exact inclusive form):
    // the fused rule bails, the join rule serves the join (hoisting
    // the filter above), the planner aggregates the grouped rows
    val filtered = "SELECT k, COUNT(*) AS n FROM fusn_l JOIN fusn_r " +
      "ON k = rk WHERE v_a > 50 GROUP BY k"
    assert(shape(filtered) === ((false, true)),
      "non-minable star query must take join-rewrite + planner aggregate")
    parityOnly(filtered)
    // grouping by a NON-key column: same layered fallback
    val nonKey = "SELECT s_a, COUNT(*) AS n FROM fusn_l JOIN fusn_r " +
      "ON k = rk GROUP BY s_a"
    assert(shape(nonKey) === ((false, true)))
    parityOnly(nonKey)
    // an agg column named on BOTH sides: the fused operator refuses
    // ambiguity, the rule bails, the layered fallback serves exact
    // rows (name-based binding never silently picks a side)
    val ambig = "SELECT k, SUM(fusn_l.dup) AS sd FROM fusn_l JOIN fusn_r " +
      "ON k = rk GROUP BY k"
    assert(shape(ambig) === ((false, true)))
    parityOnly(ambig)
    // DISTINCT aggregate: outside the fold vocabulary
    val distinct = "SELECT k, COUNT(DISTINCT v_b) AS nd FROM fusn_l " +
      "JOIN fusn_r ON k = rk GROUP BY k"
    assert(shape(distinct) === ((false, true)))
    parityOnly(distinct)
    // modulus mismatch: nothing aligned fires at all
    val mism = "SELECT k, COUNT(*) AS n FROM fusn_l JOIN fusn_r8 " +
      "ON k = rk GROUP BY k"
    assert(shape(mism) === ((true, true)))
    parityOnly(mism)
  }
}
