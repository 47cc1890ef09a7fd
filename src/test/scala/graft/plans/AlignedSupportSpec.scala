package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.LongType

/** The shared rewrite support layer: [[RangeMining]]'s two mining
  * contracts (relaxed scan reducers vs lossless windows) and
  * [[AlignedPlanCache]]'s bounded-LRU eviction with re-probe
  * correctness (VERDICT r16 hygiene #3's Done criterion).
  */
class AlignedSupportSpec extends SparkSpec {

  private val a = AttributeReference("c", LongType)()
  private val b = AttributeReference("d", LongType)()
  private def lit(v: Long): Literal = Literal(v)

  test("RangeMining.exact: complete inclusive windows mine, anything " +
    "lossy bails") {
    // BETWEEN → one window
    assert(RangeMining.exact(Seq[Expression](
      org.apache.spark.sql.catalyst.expressions.And(
        GreaterThanOrEqual(a, lit(1)), LessThanOrEqual(a, lit(9)))))
      === Some(Seq(("c", 1L, 9L))))
    // equality → degenerate window
    assert(RangeMining.exact(Seq[Expression](EqualTo(a, lit(5))))
      === Some(Seq(("c", 5L, 5L))))
    // literal-first mirrors orient correctly (5 <= c AND 9 >= c)
    assert(RangeMining.exact(Seq[Expression](
      org.apache.spark.sql.catalyst.expressions.And(
        LessThanOrEqual(lit(5), a), GreaterThanOrEqual(lit(9), a))))
      === Some(Seq(("c", 5L, 9L))))
    // IS NOT NULL on a WINDOWED column is implied — consumed
    assert(RangeMining.exact(Seq[Expression](IsNotNull(a),
      GreaterThanOrEqual(a, lit(1)), LessThanOrEqual(a, lit(2))))
      === Some(Seq(("c", 1L, 2L))))
    // two columns, two windows
    assert(RangeMining.exact(Seq[Expression](
      GreaterThanOrEqual(a, lit(1)), LessThanOrEqual(a, lit(2)),
      EqualTo(b, lit(7)))).map(_.toSet)
      === Some(Set(("c", 1L, 2L), ("d", 7L, 7L))))
    // BAILS: strict comparison (no exact inclusive form)
    assert(RangeMining.exact(Seq[Expression](
      GreaterThan(a, lit(1)), LessThanOrEqual(a, lit(9)))).isEmpty)
    // BAILS: one-sided bound
    assert(RangeMining.exact(Seq[Expression](
      GreaterThanOrEqual(a, lit(1)))).isEmpty)
    // BAILS: duplicate bound on one side (a conjunct would drop)
    assert(RangeMining.exact(Seq[Expression](
      GreaterThanOrEqual(a, lit(1)), GreaterThanOrEqual(a, lit(2)),
      LessThanOrEqual(a, lit(9)))).isEmpty)
    // BAILS: IS NOT NULL on a column with no window
    assert(RangeMining.exact(Seq[Expression](IsNotNull(b),
      GreaterThanOrEqual(a, lit(1)), LessThanOrEqual(a, lit(2)))).isEmpty)
    // BAILS: NULL literal (never matches; not expressible)
    assert(RangeMining.exact(Seq[Expression](
      EqualTo(a, Literal(null, LongType)))).isEmpty)
    // BAILS: non-comparison conjunct
    assert(RangeMining.exact(Seq[Expression](
      org.apache.spark.sql.catalyst.expressions.Not(
        EqualTo(a, lit(3))))).isEmpty)
    // empty input → empty windows (serves, nothing to mine)
    assert(RangeMining.exact(Nil) === Some(Nil))
    // notNullOk (r18, ADVICE r17): a caller-implied IS NOT NULL (the
    // join key a replacement drops at the scan) is consumed even
    // with no window on its column ...
    assert(RangeMining.exact(Seq[Expression](IsNotNull(b)),
      notNullOk = Set("d")) === Some(Nil))
    assert(RangeMining.exact(Seq[Expression](IsNotNull(b),
      GreaterThanOrEqual(a, lit(1)), LessThanOrEqual(a, lit(2))),
      notNullOk = Set("d")) === Some(Seq(("c", 1L, 2L))))
    // ... while any OTHER windowless IS NOT NULL still bails
    assert(RangeMining.exact(Seq[Expression](IsNotNull(a), IsNotNull(b)),
      notNullOk = Set("d")).isEmpty)
  }

  test("RangeMining.relaxed: strict bounds relax inclusively, " +
    "unminable conjuncts drop, only complete windows emit") {
    // strict > and < relax to the inclusive hint (the re-applied
    // filter above tightens)
    assert(RangeMining.relaxed(Seq[Expression](
      GreaterThan(a, lit(1)), LessThan(a, lit(9))))
      === Seq(("c", 1L, 9L)))
    // an unminable conjunct drops silently; the window still emits
    assert(RangeMining.relaxed(Seq[Expression](
      org.apache.spark.sql.catalyst.expressions.Not(EqualTo(b, lit(0))),
      GreaterThanOrEqual(a, lit(2)), LessThanOrEqual(a, lit(3))))
      === Seq(("c", 2L, 3L)))
    // a one-sided bound emits NO window (both bounds required)
    assert(RangeMining.relaxed(Seq[Expression](
      GreaterThanOrEqual(a, lit(2)))) === Nil)
    // first bound wins on duplicates (conservative is fine here)
    assert(RangeMining.relaxed(Seq[Expression](
      GreaterThanOrEqual(a, lit(5)), GreaterThanOrEqual(a, lit(1)),
      LessThanOrEqual(a, lit(9)))) === Seq(("c", 5L, 9L)))
  }

  test("RewriteDiag.attempt: success passes through; a refusal returns " +
    "None and logs once per (tables, shape)") {
    val before = RewriteDiag.loggedCount
    assert(RewriteDiag.attempt("spec-shape", "specA@0")(42) === Some(42))
    assert(RewriteDiag.loggedCount === before, "a success must not log")
    def refuse(): Option[Int] = RewriteDiag.attempt[Int]("spec-shape",
      "specA@0")(throw new IllegalArgumentException("operator refused"))
    assert(refuse() === None)
    assert(RewriteDiag.loggedCount === before + 1,
      "the first refusal of a shape must log")
    assert(refuse() === None)
    assert(RewriteDiag.loggedCount === before + 1,
      "a repeat refusal of the same (tables, shape) must not re-log")
    assert(RewriteDiag.attempt[Int]("spec-shape", "specB@3")(
      throw new IllegalStateException("other table")) === None)
    assert(RewriteDiag.loggedCount === before + 2,
      "a different table@version logs its own line")
  }

  test("a mid-rewrite operator refusal falls back to the planner's " +
    "aggregate (and logs) instead of erroring") {
    val s = spark
    import s.implicits._
    // an UNBUCKETED table with a POISONED alignability memo: the rule's
    // probe says yes, so it reaches the operator, whose own refusal
    // (no bucket layout) must fall back to the planner — the
    // rewrite-never-errors contract, now observable via the log
    val dir = graft.TempDirs.create("graft-diag-fallback")
    Snapshots.commit((0 until 40).map(i => (i.toLong % 5, s"v$i"))
      .toDF("k", "v"), dir, "overwrite")
    AlignedPlanCache.clear()
    AlignedPlanCache.probe(dir, 0L, "k", Some((4, LongType)))
    spark.read.format("graft").load(dir).createOrReplaceTempView("diag_t")
    val before = RewriteDiag.loggedCount
    try {
      val got = spark.sql("SELECT k, COUNT(*) AS n FROM diag_t GROUP BY k")
      assert(got.collect().length === 5, "the planner fallback must serve")
      assert(RewriteDiag.loggedCount > before,
        "the swallowed operator refusal must be logged")
    } finally AlignedPlanCache.clear()
  }

  test("AlignedPlanCache: bounded LRU evicts past the cap and a " +
    "re-probe after eviction recomputes correctly") {
    AlignedPlanCache.clear()
    var computes = 0
    // prime one REAL entry backed by a real table, via the probe the
    // rules use
    val s = spark
    import s.implicits._
    val dir = graft.TempDirs.create("graft-plancache")
    Snapshots.commit((0 until 50).map(i => (i.toLong % 7, s"v$i"))
      .toDF("k", "v"), dir, "overwrite", bucketBy = Some(("k", 4)))
    def probeReal(): Option[(Int, org.apache.spark.sql.types.DataType)] =
      AlignedPlanCache.probe(dir, 0L, "k", {
        computes += 1
        val m = Snapshots.readManifest(spark, dir, 0L)
        m.bucketSpec.map { case (_, n) => (n, LongType) }
      })
    assert(probeReal() === Some((4, LongType)) && computes === 1)
    assert(probeReal() === Some((4, LongType)) && computes === 1,
      "a cached probe must not recompute")
    // flood with synthetic entries well past the 1024 cap
    (0 until 1500).foreach(i =>
      AlignedPlanCache.probe(s"/synthetic/$i", 0L, "k", None))
    assert(AlignedPlanCache.size <= 1024,
      s"cache must stay bounded, got ${AlignedPlanCache.size}")
    // the real entry was evicted (inserted first, never re-accessed
    // during the flood)
    assert(!AlignedPlanCache.contains(dir, 0L, "k"),
      "the LRU must have evicted the oldest entry")
    // a re-probe recomputes and lands the same verdict — eviction is
    // a cost, never a correctness event
    assert(probeReal() === Some((4, LongType)) && computes === 2)
    assert(probeReal() === Some((4, LongType)) && computes === 2)
    AlignedPlanCache.clear()
  }
}
