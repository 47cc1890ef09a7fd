package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the iterative PageRank, the SCD2 history
  * build, the token-frequency profile, and the price histogram —
  * the properties the value-equality oracle can't express.
  */
class GraphHistorySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pagerank: all nodes ranked, mass ≈ conserved, teleport floor holds") {
    val rows = Graph.pageRank(spark, sf).collect()
    assert(rows.length === 25, "every nation is ranked")
    val s = 1000000000000L
    val mass = rows.map(_.getAs[Long]("rank_micro")).sum
    // each truncating division loses < 1 micro-unit per edge/node; with
    // 625 edges × 3 rounds the loss is bounded far under 0.1% of S
    assert(mass <= s && mass > s - s / 1000, s"mass drift: $mass vs $s")
    val base = s * 15L / 100L / 25L
    assert(rows.forall(_.getAs[Long]("rank_micro") >= base),
      "teleport term is a hard floor for every node")
    // output is ordered by rank desc, node asc
    val order = rows.map(r => (-r.getAs[Long]("rank_micro"), r.getAs[Long]("node")))
    assert(order.sameElements(order.sorted), "total-order output")
  }

  test("pagerank: reliable-checkpoint mode returns identical ranks") {
    val normal = Graph.pageRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_micro"))).toSeq
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val reliable = Graph.pageRank(spark, sf).collect()
        .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_micro"))).toSeq
      assert(reliable === normal)
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }

  test("pagerank: uniform synthetic graph converges to uniform ranks") {
    // complete 4-node digraph with equal weights: the stationary
    // distribution is uniform, so after any number of rounds every
    // node's rank must be identical (same integer ops per node)
    import spark.implicits._
    val ranks = {
      // run the same arithmetic as Graph.pageRank on an inline frame:
      // 4 nodes, every ordered pair an edge with w=1
      val edges = (for { a <- 0 to 3; b <- 0 to 3 if a != b }
        yield (a.toLong, b.toLong, 1L)).toDF("src", "dst", "w")
      val outW = edges.groupBy("src").agg(sum("w").as("out_w"))
      val e = edges.join(outW, "src")
      val s0 = 1000000000000L
      var r = (0 to 3).map(n => (n.toLong, s0 / 4)).toDF("node", "r")
      for (_ <- 1 to 3) {
        val inSum = e.join(r, col("src") === col("node"))
          .select(col("dst"), expr("(r * w) div out_w").as("c"))
          .groupBy("dst").agg(sum("c").as("in_sum"))
        r = inSum.select(col("dst").as("node"),
          (lit(s0 * 15L / 100L / 4L) + expr("(85 * in_sum) div 100")).as("r"))
      }
      r.collect().map(_.getAs[Long]("r"))
    }
    assert(ranks.distinct.length === 1, "uniform graph ⇒ uniform ranks")
  }

  test("scd2: runs collapse, bounds chain, exactly one current version") {
    import spark.implicits._
    val events = Seq(
      // user 1: A A B B A  → versions A, B, A
      (1L, "A", 1L, 1L), (1L, "A", 2L, 2L), (1L, "B", 3L, 3L),
      (1L, "B", 4L, 4L), (1L, "A", 5L, 5L),
      // user 2: single run
      (2L, "X", 1L, 6L), (2L, "X", 9L, 7L))
      .toDF("user_id", "event_type", "mins", "event_id")
      .withColumn("ts", timestamp_seconds(col("mins") * 60)).drop("mins")
    val h = History.scd2(events, "user_id", "event_type", "ts", "event_id")
      .collect()
    val u1 = h.filter(_.getLong(0) == 1L).map(r =>
      (r.getAs[Int]("version"), r.getString(2), r.getAs[Boolean]("is_current")))
    assert(u1.toSeq === Seq((1, "A", false), (2, "B", false), (3, "A", true)))
    val u2 = h.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getAs[Boolean]("is_current"))
    // validity bounds chain: each non-current row's effective_to equals
    // the next version's effective_from
    h.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("version"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("effective_to") ===
            b.getAs[java.sql.Timestamp]("effective_from"))
        case _ => ()
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1)
    }
  }

  test("scd2: rejects frames missing a named column") {
    import spark.implicits._
    val bad = Seq((1L, "A")).toDF("user_id", "event_type")
    val e = intercept[IllegalArgumentException] {
      History.scd2(bad, "user_id", "event_type", "ts", "event_id")
    }
    assert(e.getMessage.contains("missing column"))
  }

  test("token-freq: hapax ⊆ rare, ratios in [0,1], df floor of 1") {
    val rows = TextAnalysis.tokenFreqScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rare = r.getAs[Double]("rare_ratio")
      val hapax = r.getAs[Double]("hapax_ratio")
      assert(hapax >= 0.0 && rare <= 1.0 && hapax <= rare,
        "df=1 tokens are a subset of df≤2 tokens")
      assert(r.getAs[Double]("mean_df") >= 1.0,
        "every token appears in at least its own document")
    }
  }

  test("skew profile: planted hot key dominates, shares are exact") {
    import spark.implicits._
    val rows = (1 to 90).map(_ => 100L) ++ (1 to 10).map(_.toLong)
    val out = SkewJoin.skewProfile(rows.toDF("k"), "k", k = 3).collect()
    assert(out.head.getLong(0) === 100L && out.head.getLong(1) === 90L)
    assert(out.head.getAs[Double]("share") === 0.9)
    assert(out.length === 3)
  }

  test("referential integrity: star schema has zero orphans") {
    val rows = CorpusQueries.dq1RefIntegrity(spark, sf).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.getString(0))
      assert(r.getAs[Long]("n_child") > 0L)
    }
  }

  test("sliding window: every event lands in exactly 4 windows") {
    val n = CorpusQueries.q36SlidingWindow(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    val events = graft.Tables.events(spark, sf).count()
    assert(n === events * 4)
  }

  test("hybrid ANN: recall dominates each single probe") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val truth = pairs(Similarity.knnBrute(spark, sf, k = 3))
    val lsh = pairs(Similarity.knnBucketed(spark, sf))
    val ivf = pairs(Similarity.knnIvf(spark, sf))
    val hybrid = pairs(Similarity.knnHybrid(spark, sf))
    val rL = (lsh & truth).size
    val rI = (ivf & truth).size
    val rH = (hybrid & truth).size
    // the hybrid candidate set is a superset of each probe's, and
    // true-top-k members rank highest among any candidate set that
    // contains them — so its recall can never be below either probe's
    assert(rH >= math.max(rL, rI), s"hybrid $rH vs lsh $rL / ivf $rI")
  }

  test("funnel: stage counts are monotonically non-increasing") {
    val counts = CorpusQueries.f1Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(counts.size === 3)
    assert(counts("1_view") >= counts("2_click"))
    assert(counts("2_click") >= counts("3_purchase"))
  }

  test("retention: offset-0 row equals the cohort size") {
    val rows = CorpusQueries.f2Retention(spark, sf).collect()
    val cohortSizes = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(r => r.getDate(0) -> r.getAs[Long]("n_users")).toMap
    // every user is active on their own cohort day, so no later offset
    // of a cohort can exceed its day-0 count
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= cohortSizes(r.getDate(0)))
      assert(r.getAs[Int]("day_offset") >= 0)
    }
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cohortSizes.values.sum === users, "cohorts partition the users")
  }

  test("multimodal manifest: rows partition the doc-embedding join") {
    val m = Pipeline.multimodalManifest(spark, sf).collect()
    val total = m.map(_.getAs[Long]("n_rows")).sum
    val docs = graft.Tables.documents(spark, sf).count()
    assert(total === docs, "every doc has exactly one embedding row")
    m.foreach(r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_rows")))
  }

  test("manifest: splits partition the kept+deduped docs") {
    val m = Pipeline.trainingManifest(spark, sf).collect()
    assert(m.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    val total = m.map(_.getAs[Long]("n_docs")).sum
    val expected = TextAnalysis.qualityFilter(spark, sf)
      .filter(col("keep"))
      .join(graft.Tables.documents(spark, sf), "doc_id")
      .select(sha2(col("text"), 256)).distinct().count()
    assert(total === expected,
      "one manifest doc per distinct kept content hash")
  }

  test("histogram: bins partition the corpus, edges are exact") {
    val rows = CorpusQueries.h1Histogram(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_items")).sum
    val corpus = graft.Tables.lineitem(spark, sf).count()
    assert(total === corpus, "every row lands in exactly one bin")
    rows.foreach { r =>
      val lo = r.getAs[Long]("bin_lo").toDouble
      assert(r.getAs[Double]("min_price") >= lo)
      assert(r.getAs[Double]("max_price") < lo + 5000.0)
    }
  }
}
