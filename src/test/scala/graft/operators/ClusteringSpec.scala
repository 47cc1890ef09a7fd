package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup clustering, contamination, vocabulary — and the bucketed-table
  * co-located join (the zero-shuffle join path at 100 TB).
  */
class ClusteringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("incremental dedup equals the one-shot dedup, reps unique") {
    val inc = Dedup.d9IncrementalDedup(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val oneShot = graft.Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("text"), 256))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("rep"))
      .select("rep").collect().map(_.getLong(0)).toSeq.sorted
    assert(inc === oneShot)
    assert(inc.distinct.size === inc.size)
  }

  test("incremental LSH equals the one-shot LSH pair-for-pair") {
    val inc = Dedup.d10IncrementalLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShot = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc === oneShot)
    assert(inc.nonEmpty)
    inc.foreach { case (d1, d2) => assert(d1 < d2) }
  }

  test("incremental == one-shot holds under randomized batch cuts and counts") {
    // the equality claim is not an artifact of the default thirds
    // split: any id-RANGE partition of the corpus, at any batch count,
    // must reproduce the one-shot result exactly (range cuts are the
    // load-bearing part — see commitIdRangeBatches scaladoc)
    val ids = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val oneShotReps = graft.Tables.documents(spark, sf)
      .groupBy(sha2(col("text"), 256))
      .agg(min("doc_id").as("rep"))
      .select("rep").collect().map(_.getLong(0)).toSeq.sorted
    val rnd = new scala.util.Random(20260813L)
    // interior cuts sampled from real ids (max excluded) => every
    // batch of (lo, hi] ranges is non-empty by construction
    def randomCuts(n: Int): Seq[Long] =
      rnd.shuffle(ids.init.toSeq).take(n).sorted
    (1 to 3).foreach { round =>
      val cuts = randomCuts(1 + rnd.nextInt(4)) // 2-5 batches
      val inc = Dedup.d9IncrementalDedup(spark, sf, Some(cuts))
        .collect().map(_.getLong(0)).toSeq
      assert(inc === oneShotReps, s"d9 diverged for cuts=$cuts (round $round)")
    }
    val lshCuts = randomCuts(3) // 4 batches, one more than the default demo
    val incPairs = Dedup.d10IncrementalLsh(spark, sf, cuts = Some(lshCuts))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShotPairs = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(incPairs === oneShotPairs, s"d10 diverged for cuts=$lshCuts")
  }

  test("dedup clusters: every cluster has >= 2 members and a min-id rep") {
    val rows = Dedup.dedupClusters(spark, sf).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      val cluster = r.getAs[Long]("cluster")
      val idSum = r.getAs[Long]("member_id_sum")
      assert(n >= 2, "a component of the pair graph has >= 2 nodes")
      // rep is the min member id, so sum of the other ids > rep*(n-1)
      assert(idSum >= cluster * n, "cluster label must be the minimum id")
    }
  }

  test("clusters are consistent with the pair graph (every pair co-clustered)") {
    val pairs = Dedup.minhashLsh(spark, sf).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // rebuild membership: cluster of each doc via union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => find(x) -> x).toSeq
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).size.toLong, xs.map(_._2).sum) }
      .toSet
    val got = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
        r.getAs[Long]("member_id_sum"))).toSet
    assert(got === expected)
  }

  test("canonical docs: exactly one keeper per cluster, best quality wins") {
    val rows = Dedup.d11CanonicalDocs(spark, sf).collect()
    // every document decided exactly once
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === rows.length)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, g) =>
      val keepers = g.filter(_.getAs[Int]("keep") === 1)
      assert(keepers.length === 1, s"cluster $c needs exactly one keeper")
      // the keeper's (quality, -doc_id) dominates every member
      val k = keepers.head
      g.foreach { m =>
        val better = m.getAs[Double]("quality") > k.getAs[Double]("quality") ||
          (m.getAs[Double]("quality") == k.getAs[Double]("quality") &&
            m.getAs[Long]("doc_id") < k.getAs[Long]("doc_id"))
        assert(!better, s"cluster $c keeper is not the best member")
      }
    }
    // drops happen only inside multi-member clusters, and the cluster
    // partition agrees with dedupClusters' membership counts
    val multi = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_members")).toMap
    byCluster.foreach { case (c, g) =>
      assert(g.length.toLong === multi.getOrElse(c, 1L))
    }
    assert(rows.count(_.getAs[Int]("keep") === 0) ===
      multi.values.map(_ - 1).sum)
  }

  test("dedup clusters: reliable-checkpoint mode returns identical clusters") {
    val expected = Dedup.dedupClusters(spark, sf).collect().toSet
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    spark.conf.set("spark.graft.checkpointDir",
      java.nio.file.Files.createTempDirectory("graft-rckpt").toString)
    try {
      val got = Dedup.dedupClusters(spark, sf).collect().toSet
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoint")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("ngram jaccard: hot-shingle guard bounds boilerplate blow-up") {
    import spark.implicits._
    // 150 docs share ONE boilerplate 5-gram (a header/license analogue);
    // every other shingle is doc-unique. Ungated, the self-join emits
    // 150*149/2 rows for that single bucket; with the df cap the bucket
    // vanishes and only the genuine near-dup pair survives.
    val boiler = (1 to 150).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon u${i}a u${i}b u${i}c u${i}d u${i}e"))
    val dupText = "zeta eta theta iota kappa lambda mu nu xi omicron"
    val docs = (boiler :+ (1001L, dupText) :+ (1002L, dupText))
      .toDF("doc_id", "text")
    val gated = Dedup.ngramJaccardDocs(docs, minJaccard = 0.8, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(gated.toSeq === Seq((1001L, 1002L, 1.0)),
      "only the genuine duplicate pair survives; boilerplate emits none")
    // the cap changes no verdicts here: ungated, boilerplate pairs share
    // 1 of 11 shingles (jaccard ~0.09, far below 0.8) — same output, but
    // only after materializing the quadratic bucket the guard avoids
    val ungated = Dedup.ngramJaccardDocs(docs, minJaccard = 0.8, maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ungated.toSeq === gated.toSeq)
  }

  test("dup passages: planted shared passage flagged, unique docs clean") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"epsilon zeta $passage eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma"))
      .toDF("doc_id", "text")
    val out = Dedup.dupPassagesDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_dup_windows")).toMap
    assert(out(1L) === 1L && out(2L) === 1L,
      "exactly the one shared 8-token window is flagged in each copy")
    assert(out(3L) === 0L, "a unique doc has no duplicated windows")
  }

  test("contamination pairs always cross a split boundary") {
    val rows = Dedup.crossSplitContamination(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("split1") !== r.getAs[String]("split2"))
    }
  }

  test("vocab: df bounded by corpus size, ordered by df desc") {
    val rows = TextAnalysis.vocab(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val dfs = rows.map(_.getAs[Long]("df")).toSeq
    assert(dfs === dfs.sorted.reverse)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") <= 500)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
    }
  }

  test("chunking: strided starts, bounded sizes, full coverage") {
    val chunks = TextAnalysis.chunk(spark, sf).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size === 500, "every document chunks")
    byDoc.values.foreach { g =>
      val idx = g.map(_.getAs[Int]("chunk_idx")).sorted.toSeq
      assert(idx === (0 until g.length), "contiguous chunk indices")
      g.foreach { r =>
        val n = r.getAs[Int]("n_tokens")
        assert(n >= 1 && n <= 64)
      }
      // a non-last chunk's start is followed by at least one more
      // stride, so it holds at least stride+1 = 49 tokens
      val nonLast = g.sortBy(_.getAs[Int]("chunk_idx")).dropRight(1)
      assert(nonLast.forall(_.getAs[Int]("n_tokens") >= 49))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.SaveMode
    graft.Tables.orders(spark, sf)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    graft.Tables.customer(spark, sf)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    // disable auto-broadcast so the join exercises the bucketed
    // (co-located sort-merge) path, which is what a 100 TB fact-to-fact
    // join would take — restore the conf afterwards
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    // pre-bucketed layout: the join reads co-located buckets — the plan
    // must contain NO exchange on the join keys (the aggregation above
    // it may still exchange on its own grouping key). Textual check:
    // AdaptiveSparkPlanExec hides the wrapped plan from collect().
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join must not shuffle on the join keys:\n${plan.take(2000)}")
    // and it still returns correct results
    assert(joined.collect().map(_.getAs[Long]("count")).sum ===
      graft.Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
