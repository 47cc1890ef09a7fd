package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The SQL→storage-partitioned-join rewrite ([[AlignedJoin]], VERDICT
  * r15 task #3; extended to the join FAMILY — left outer / semi /
  * anti — per VERDICT r16 task #3): fires exactly when both sides of
  * a single-key equi-join of a served type are graft relations
  * bucket-clustered on the join keys with one modulus — and NEVER
  * otherwise. Every leg checks rows against the planner's own join,
  * because the rewrite's contract is strategy-only.
  */
class AlignedJoinRuleSpec extends SparkSpec {

  private def freshDir(): String = graft.TempDirs.create("graft-sqlspj")

  private def commitBucketed(dir: String, n: Int, rows: Int,
                             key: String, tag: String): Unit = {
    val s = spark
    import s.implicits._
    Snapshots.commit(
      (0 until rows).map(i => (i.toLong % 97, s"$tag-$i")).toDF(key, s"v_$tag"),
      dir, "overwrite", bucketBy = Some((key, n)))
  }

  private def graftView(dir: String, name: String): Unit =
    spark.read.format("graft").load(dir).createOrReplaceTempView(name)

  test("fires on matching layouts: no join operator in the plan, rows " +
    "equal the planner's join, pruned SELECT lists still fire") {
    val l = freshDir(); val r = freshDir()
    commitBucketed(l, 4, 500, "k", "l")
    commitBucketed(r, 4, 300, "rk", "r")
    graftView(l, "sqlspj_l"); graftView(r, "sqlspj_r")
    val sql = "SELECT * FROM sqlspj_l JOIN sqlspj_r ON k = rk"
    val joined = spark.sql(sql)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"rule must fire on the bare join:\n$plan")
    assert(Snapshots.alignedInnerShuffleFree())
    val expected = try {
      spark.conf.set("graft.sql.alignedJoin.enabled", "false")
      val e = spark.sql(sql)
      assert(e.queryExecution.executedPlan.toString.contains("Join"),
        "the disable switch must restore the planner's join")
      e.collect().toSeq
    } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
    val got = joined.collect().toSeq
    assert(got.map(_.toString).sorted === expected.map(_.toString).sorted)
    // a PRUNED select list (ColumnPruning's Project under the join)
    // still fires and stays pruned-correct
    val pruned = spark.sql(
      "SELECT v_l, v_r FROM sqlspj_l JOIN sqlspj_r ON k = rk")
    assert(!pruned.queryExecution.executedPlan.toString.contains("Join"))
    val expPruned = expected.map(row =>
      (row.getString(1), row.getString(3))).sorted
    assert(pruned.collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq.sorted === expPruned)
    // an aggregate over the join fires too — the exchange above the
    // rewritten join moves grouped rows only
    val agg = spark.sql(
      "SELECT k, COUNT(*) AS n FROM sqlspj_l JOIN sqlspj_r ON k = rk " +
        "GROUP BY k")
    assert(!agg.queryExecution.executedPlan.toString.contains("Join"))
    val expAgg = try {
      spark.conf.set("graft.sql.alignedJoin.enabled", "false")
      spark.sql("SELECT k, COUNT(*) AS n FROM sqlspj_l JOIN sqlspj_r " +
        "ON k = rk GROUP BY k").collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
    assert(agg.collect().map(_.toString).sorted.toSeq === expAgg)
  }

  test("never fires when preconditions fail: mismatched modulus, " +
    "unclustered files, non-key equality, right joins, null-aware " +
    "anti, filtered sides") {
    val l = freshDir(); val r4 = freshDir(); val r8 = freshDir()
    commitBucketed(l, 4, 200, "k", "l")
    commitBucketed(r4, 4, 200, "rk", "r")
    commitBucketed(r8, 8, 200, "rk", "r")
    graftView(l, "spjn_l"); graftView(r4, "spjn_r4"); graftView(r8, "spjn_r8")
    def firedOn(sql: String): Boolean =
      !spark.sql(sql).queryExecution.executedPlan.toString.contains("Join")
    // modulus mismatch → planner join
    assert(!firedOn("SELECT * FROM spjn_l JOIN spjn_r8 ON k = rk"))
    // RIGHT outer → planner join (swap the sides to serve it)
    assert(!firedOn("SELECT * FROM spjn_l RIGHT JOIN spjn_r4 ON k = rk"))
    // null-aware NOT IN (the OR'd IS NULL anti condition) → planner
    assert(!firedOn(
      "SELECT * FROM spjn_l WHERE k NOT IN (SELECT rk FROM spjn_r4)"))
    // a non-minable right-side filter under a SEMI join → planner
    // (it is part of the right side's definition — cannot hoist, and
    // `<>` has no exact BETWEEN form)
    assert(!firedOn("SELECT * FROM spjn_l WHERE k IN " +
      "(SELECT rk FROM spjn_r4 WHERE v_r <> 'r-3')"))
    // ... same shape under a LEFT OUTER join → planner
    assert(!firedOn("SELECT * FROM spjn_l LEFT JOIN " +
      "(SELECT * FROM spjn_r4 WHERE v_r <> 'r-3') t ON k = rk"))
    // equality on a NON-bucket column → planner join
    assert(!firedOn("SELECT * FROM spjn_l JOIN spjn_r4 ON v_l = v_r"))
    // a NON-deterministic filter → planner join (hoisting it above
    // the join would change which rows it samples; rand() < 2 would
    // constant-fold away, so the bound must be genuinely uncertain)
    assert(!firedOn("SELECT * FROM (SELECT * FROM spjn_l " +
      "WHERE rand() < 0.999) t JOIN spjn_r4 ON k = rk"))
    // an unclustered tail on one side → planner join
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1000L, "tail")).toDF("rk", "v_r"), r4, "append")
    graftView(r4, "spjn_r4t")
    assert(!firedOn("SELECT * FROM spjn_l JOIN spjn_r4t ON k = rk"))
    // and in every refused case the planner's answer still serves
    assert(spark.sql("SELECT COUNT(*) FROM spjn_l JOIN spjn_r8 ON k = rk")
      .head().getLong(0) > 0)
  }

  test("filtered sides fire (r16): WHERE conjuncts hoist above the " +
    "rewrite, BETWEEN windows prune the scan, rows equal the planner") {
    val l = freshDir(); val r = freshDir()
    // two range-sliced commits per side so the mined window has
    // files to prune; stats on the filter columns
    val s = spark
    import s.implicits._
    Seq((0, 400), (400, 800)).zipWithIndex.foreach { case ((lo, hi), i) =>
      Snapshots.commit(
        (lo until hi).map(j => (j.toLong % 97, j.toLong, s"l-$j"))
          .toDF("k", "t", "v_l").coalesce(1),
        l, if (i == 0) "overwrite" else "append",
        bucketBy = Some(("k", 4)), statsColumns = Seq("t"))
      Snapshots.commit(
        (lo until hi).map(j => (j.toLong % 97, j.toLong, s"r-$j"))
          .toDF("rk", "rt", "v_r").coalesce(1),
        r, if (i == 0) "overwrite" else "append",
        bucketBy = Some(("rk", 4)), statsColumns = Seq("rt"))
    }
    graftView(l, "spjf_l"); graftView(r, "spjf_r")
    val sql = "SELECT * FROM spjf_l JOIN spjf_r ON k = rk " +
      "WHERE t BETWEEN 100 AND 300 AND rt BETWEEN 0 AND 350 " +
      "AND v_l <> 'l-7'"
    val joined = spark.sql(sql)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"the rule must fire through pushed filters:\n$plan")
    // the mined windows actually pruned: on these unsorted layouts
    // the aligned join plans one scan per BUCKET, so count scanned
    // FILES via the window math instead — both sides' slice-2 files
    // fall outside [.,300]/[.,350]? slice 2 is t in [400,800) — out
    // of both windows, so each side reads half its files; witness it
    // end to end through the row parity below plus the inner plans
    assert(Snapshots.alignedInnerShuffleFree())
    val expected = try {
      spark.conf.set("graft.sql.alignedJoin.enabled", "false")
      spark.sql(sql).collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
    assert(expected.nonEmpty)
    assert(joined.collect().map(_.toString).sorted.toSeq === expected,
      "filtered-join parity with the planner")
    // the residual (non-range) conjunct is enforced: no 'l-7' row
    assert(!joined.collect().exists(_.getString(2) == "l-7"))
  }

  test("join family fires (r17): LEFT OUTER null-extends, IN-subquery " +
    "semi and NOT-EXISTS anti rewrite, each with planner parity") {
    val l = freshDir(); val r = freshDir()
    // right side covers only keys 0..49, so LEFT OUTER has genuine
    // null-extended rows and anti has genuine survivors
    commitBucketed(l, 4, 500, "k", "l")
    commitBucketed(r, 4, 50, "rk", "r")
    graftView(l, "spjfam_l"); graftView(r, "spjfam_r")
    def parity(sql: String): Unit = {
      val q = spark.sql(sql)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"rule must fire on: $sql\n$plan")
      val got = q.collect().map(_.toString).sorted.toSeq
      val expected = try {
        spark.conf.set("graft.sql.alignedJoin.enabled", "false")
        val e = spark.sql(sql)
        assert(e.queryExecution.executedPlan.toString.contains("Join"),
          s"the disable switch must restore the planner's join: $sql")
        e.collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
      assert(expected.nonEmpty, s"vacuous parity: $sql")
      assert(got === expected, s"family parity failed: $sql")
    }
    // LEFT OUTER: unmatched keys 50..96 appear with NULL right fields
    val outerSql = "SELECT * FROM spjfam_l LEFT JOIN spjfam_r ON k = rk"
    parity(outerSql)
    assert(spark.sql(outerSql).filter(col("rk").isNull).count() > 0,
      "the outer fixture must exercise null extension")
    // LEFT SEMI via IN subquery
    parity("SELECT * FROM spjfam_l WHERE k IN (SELECT rk FROM spjfam_r)")
    // LEFT ANTI via NOT EXISTS (plain equality — not the null-aware
    // NOT IN shape, which stays with the planner)
    parity("SELECT * FROM spjfam_l WHERE NOT EXISTS " +
      "(SELECT 1 FROM spjfam_r WHERE rk = k)")
    // LEFT-side filters hoist above the family rewrite too
    parity("SELECT * FROM spjfam_l LEFT JOIN spjfam_r ON k = rk " +
      "WHERE v_l <> 'l-7'")
  }

  test("multi-conjunct conditions fire for INNER (r18): extra " +
    "equalities and non-equi conjuncts re-apply above the zip; " +
    "outer and anti with residuals bail") {
    val l = freshDir(); val r = freshDir()
    val s = spark
    import s.implicits._
    // x is the SLAB parity and rx is constant 0, so every leg below
    // is non-vacuous AND selective: the x = rx equality keeps even
    // slabs only, t < rt keeps low slabs only, and the two-equality
    // anti has genuine survivors (odd-slab rows)
    Snapshots.commit((0 until 500)
        .map(i => (i.toLong % 97, (i / 97).toLong % 2, i.toLong, s"l-$i"))
        .toDF("k", "x", "t", "v_l"),
      l, "overwrite", bucketBy = Some(("k", 4)))
    Snapshots.commit((0 until 97)
        .map(j => (j.toLong, 0L, j.toLong + 250L, s"v-$j"))
        .toDF("rk", "rx", "rt", "v_r"),
      r, "overwrite", bucketBy = Some(("rk", 4)))
    graftView(l, "spjm_l"); graftView(r, "spjm_r")
    def parity(sql: String, mustFire: Boolean): Unit = {
      val q = spark.sql(sql)
      val fired = !q.queryExecution.executedPlan.toString.contains("Join")
      assert(fired === mustFire,
        s"fired=$fired, expected $mustFire on: $sql")
      val got = q.collect().map(_.toString).sorted.toSeq
      val expected = try {
        spark.conf.set("graft.sql.alignedJoin.enabled", "false")
        spark.sql(sql).collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
      assert(expected.nonEmpty && got === expected,
        s"multi-conjunct parity failed: $sql")
    }
    // an extra EQUALITY conjunct: zip on the bucket keys, x = rx
    // re-applies above the replacement
    parity("SELECT * FROM spjm_l JOIN spjm_r ON k = rk AND x = rx",
      mustFire = true)
    // a NON-EQUI conjunct (the attribution/tie-break shape)
    parity("SELECT * FROM spjm_l JOIN spjm_r ON k = rk AND t < rt",
      mustFire = true)
    // both residual kinds + a pushed WHERE filter hoisting alongside
    parity("SELECT * FROM spjm_l JOIN spjm_r ON k = rk AND x = rx " +
      "AND t < rt WHERE v_l <> 'l-7'", mustFire = true)
    // the bucket-key equality may sit ANYWHERE in the conjunction —
    // the non-alignable x = rx is tried and passed over
    parity("SELECT * FROM spjm_l JOIN spjm_r ON x = rx AND k = rk",
      mustFire = true)
    // LEFT OUTER with a residual: the residual is part of the MATCH
    // condition (changes which rows null-extend) — planner serves
    parity("SELECT * FROM spjm_l LEFT JOIN spjm_r ON k = rk AND x = rx",
      mustFire = false)
    // two-equality NOT EXISTS → a multi-conjunct LeftAnti: the
    // strategy serves single equalities only — planner serves
    parity("SELECT * FROM spjm_l WHERE NOT EXISTS (SELECT 1 FROM " +
      "spjm_r WHERE rk = k AND rx = x)", mustFire = false)
  }

  test("FULL OUTER fires (r18): both sides null-extend through the SQL " +
    "rule, windowed sides mine exactly, non-minable filters and " +
    "residuals bail") {
    val l = freshDir(); val r = freshDir()
    val s = spark
    import s.implicits._
    // left keys 0..96; right keys are EVEN values 0..248 — real
    // unmatched populations on BOTH sides
    commitBucketed(l, 4, 300, "k", "l")
    Snapshots.commit((0 until 150)
        .map(j => ((j * 2).toLong % 250, j.toLong, s"r-$j"))
        .toDF("rk", "rt", "v_r"),
      r, "overwrite", bucketBy = Some(("rk", 4)), statsColumns = Seq("rt"))
    graftView(l, "spjfo_l"); graftView(r, "spjfo_r")
    def parity(sql: String, mustFire: Boolean): Unit = {
      val q = spark.sql(sql)
      val fired = !q.queryExecution.executedPlan.toString.contains("Join")
      assert(fired === mustFire, s"fired=$fired, expected $mustFire: $sql")
      val got = q.collect().map(_.toString).sorted.toSeq
      val expected = try {
        spark.conf.set("graft.sql.alignedJoin.enabled", "false")
        spark.sql(sql).collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
      assert(expected.nonEmpty && got === expected,
        s"full-outer parity failed: $sql")
    }
    val bare = "SELECT * FROM spjfo_l FULL JOIN spjfo_r ON k = rk"
    parity(bare, mustFire = true)
    // both directions genuinely null-extend
    assert(spark.sql(bare).filter(col("rk").isNull).count() > 0)
    assert(spark.sql(bare).filter(col("k").isNull).count() > 0)
    // windowed SIDES (subquery filters — a WHERE above a full join
    // would let EliminateOuterJoin demote it): both mine EXACTLY
    // into the pre-join range windows
    parity("SELECT * FROM (SELECT * FROM spjfo_l WHERE k BETWEEN 10 " +
      "AND 60) a FULL JOIN (SELECT * FROM spjfo_r WHERE rt BETWEEN 0 " +
      "AND 100) b ON a.k = b.rk", mustFire = true)
    // a NON-minable side filter: neither side can hoist over full
    // outer — the planner serves
    parity("SELECT * FROM (SELECT * FROM spjfo_l WHERE v_l <> 'l-7') a " +
      "FULL JOIN spjfo_r b ON a.k = b.rk", mustFire = false)
    // a residual conjunct changes full-outer match semantics — bail
    parity("SELECT * FROM spjfo_l FULL JOIN spjfo_r ON k = rk " +
      "AND v_l = v_r", mustFire = false)
  }

  test("exact right-side windows (r17): a BETWEEN-only subquery filter " +
    "rides the semi/outer right scan as its window, with parity") {
    val l = freshDir(); val r = freshDir()
    val s = spark
    import s.implicits._
    // two range-sliced right commits with stats so the exact window
    // also prunes files
    Snapshots.commit(
      (0 until 500).map(i => (i.toLong % 97, s"l-$i")).toDF("k", "v_l"),
      l, "overwrite", bucketBy = Some(("k", 4)))
    Seq((0, 400), (400, 800)).zipWithIndex.foreach { case ((lo, hi), i) =>
      Snapshots.commit(
        (lo until hi).map(j => (j.toLong % 97, j.toLong, s"r-$j"))
          .toDF("rk", "rt", "v_r").coalesce(1),
        r, if (i == 0) "overwrite" else "append",
        bucketBy = Some(("rk", 4)), statsColumns = Seq("rt"))
    }
    graftView(l, "spjw_l"); graftView(r, "spjw_r")
    def parity(sql: String): Unit = {
      val q = spark.sql(sql)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"rule must fire on: $sql\n$plan")
      val got = q.collect().map(_.toString).sorted.toSeq
      val expected = try {
        spark.conf.set("graft.sql.alignedJoin.enabled", "false")
        spark.sql(sql).collect().map(_.toString).sorted.toSeq
      } finally spark.conf.set("graft.sql.alignedJoin.enabled", "true")
      assert(expected.nonEmpty && got === expected,
        s"right-window parity failed: $sql")
    }
    // semi with an exactly-minable right filter: rt ∈ [0,150] keeps
    // only keys 0..96 ∩ j<=150 — a REAL subset (some keys drop)
    parity("SELECT * FROM spjw_l WHERE k IN " +
      "(SELECT rk FROM spjw_r WHERE rt BETWEEN 0 AND 45)")
    // an explicit IS NOT NULL on the join key is CONSUMED (the
    // aligned semi scan drops NULL right keys anyway — ADVICE r17),
    // so the rewrite still fires
    parity("SELECT * FROM spjw_l WHERE k IN (SELECT rk FROM spjw_r " +
      "WHERE rk IS NOT NULL AND rt BETWEEN 0 AND 45)")
    // anti against the same windowed subquery
    parity("SELECT * FROM spjw_l WHERE NOT EXISTS " +
      "(SELECT 1 FROM spjw_r WHERE rk = k AND rt BETWEEN 0 AND 45)")
    // left outer against a windowed right subquery: rows outside the
    // window null-extend instead of matching
    parity("SELECT * FROM spjw_l LEFT JOIN " +
      "(SELECT * FROM spjw_r WHERE rt BETWEEN 0 AND 45) t ON k = rk")
  }
}
