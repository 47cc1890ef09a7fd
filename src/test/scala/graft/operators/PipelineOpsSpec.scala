package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for the round-5 pipeline operators: sequence
  * packing, mixture sampling, composite quality filtering, bigram
  * statistics, embedding quantization, and the SimHash near-dup
  * profile. (End-to-end value equality is the DuckDB oracle's job;
  * these tests pin the invariants the oracle can't express.)
  */
class PipelineOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("packing: mass-preserving, bins match a driver-side recompute") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Sampling.packSequences(spark, sf).collect()
    assert(out.map(_.getAs[Long]("bin_tokens")).sum === docs.map(_._3).sum,
      "every token lands in exactly one bin")
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    // independent driver-side recompute of the greedy contiguous layout
    val assigned: Seq[(String, Long, Long, Long)] =
      docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, id, n) =>
          val bin = cum / 256; cum += n; (src, bin, id, n)
        }
      }
    val expected = assigned.groupBy(t => (t._1, t._2))
      .map { case ((src, bin), ts) =>
        (src, bin, ts.length.toLong, ts.map(_._4).sum, ts.map(_._3).sum)
      }.toSet
    val got = out.map(r => (r.getString(0), r.getLong(1),
      r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
      r.getAs[Long]("doc_id_sum"))).toSet
    assert(got === expected)
  }

  test("mixture: configured rates, bounded keeps, rerun-deterministic") {
    val out = Sampling.mixtureSample(spark, sf).collect()
    val rates = Sampling.MixtureRates.toMap
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Int]("rate_pct") === rates.getOrElse(src, 50))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
    val again = Sampling.mixtureSample(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "membership is content-hashed — identical across runs")
  }

  test("quality filter: keep is exactly the conjunction of its rules") {
    val rows = TextAnalysis.qualityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = Seq("ok_len", "ok_word_len", "ok_stop", "ok_distinct",
        "ok_digit").map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") === flags.forall(identity))
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "filter keeps something")
  }

  test("quality model: keep == (margin >= 0), squash bounded and sign-true") {
    val rows = TextAnalysis.qualityModel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("margin_micro")
      val s6 = r.getAs[Double]("score6")
      assert(r.getAs[Int]("keep") === (if (m >= 0) 1 else 0))
      assert(s6 > -1.0 && s6 < 1.0, "rational squash must stay in (-1,1)")
      assert(m == 0 || math.signum(s6.toDouble) === math.signum(m.toDouble),
        s"squash flipped the sign: margin=$m score=$s6")
      // exact linear model: margin reconstructs from the features
      val rec = 3L * r.getAs[Long]("x_distinct") -
        2L * r.getAs[Long]("x_stopword") + r.getAs[Long]("x_len") +
        800L * r.getAs[Long]("n_tokens") - 1900000L
      assert(rec === m)
    }
    // a real gate: both classes present in the corpus
    assert(rows.exists(_.getAs[Int]("keep") == 1) &&
      rows.exists(_.getAs[Int]("keep") == 0))
  }

  test("bigrams: cnt >= df >= 1, ordered desc, capped at k") {
    val rows = TextAnalysis.bigrams(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") >= r.getAs[Long]("df"))
      assert(r.getAs[Long]("df") >= 1L)
      assert(r.getAs[String]("bigram").split(" ").length === 2)
    }
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sorted.reverse, "ordered by cnt desc")
  }

  test("quantize: int8 range respected, scale element hits ±127") {
    val rows = Similarity.quantizeEmbeddings(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("dim") === 64)
      assert(r.getAs[Long]("maxabs_micro") > 0L)
      assert(r.getAs[Long]("norm_sq_micro") > 0L)
      val absSum = r.getAs[Long]("q_abs_sum")
      // the max-magnitude element quantizes to exactly ±127; nothing
      // can exceed it — so |q|₁ is within [127, 127·64]
      assert(absSum >= 127L && absSum <= 127L * 64)
    }
  }

  test("simhash near-dup profile: thresholds, symmetry, self-exclusion") {
    val rows = Dedup.simhashNearDup(spark, sf).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups")
    rows.foreach { r =>
      val h = r.getAs[Int]("nn_hamming")
      assert(h >= 0 && h <= 3)
      assert(r.getAs[Long]("nn_id") !== r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_near") >= 1L)
    }
    // every near-dup relation is mutual: total degree is even
    assert(rows.map(_.getAs[Long]("n_near")).sum % 2 === 0L)
  }

  test("simhash near-dup: hot-bucket guard drops mass clusters, keeps genuine pairs") {
    import spark.implicits._
    // 60 identical docs = one mass cluster (identical signatures fill
    // one bucket PER BAND, over the cap); plus one isolated duplicate
    // pair whose bucket holds just 2 docs. With the cap at 50 the
    // cluster contributes nothing; the small pair survives untouched.
    val cluster = (1 to 60).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
    val nearA = (1001L, "iota kappa lambda mu nu xi omicron pi")
    val nearB = (1002L, "iota kappa lambda mu nu xi omicron pi")
    val docs = (cluster :+ nearA :+ nearB).toDF("doc_id", "text")
    val capped = Dedup.simhashNearDupDocs(docs, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_near"),
        r.getAs[Long]("nn_id"))).toSeq
    assert(capped.forall(_._1 >= 1001L),
      "mass-cluster members are excluded (upstream exact dedup's job)")
    assert(capped.map(t => (t._1, t._3)).toSet === Set((1001L, 1002L), (1002L, 1001L)),
      "the genuine near-dup pair survives the guard")
    // without the cap the cluster dominates: every member near-dups
    // with all 59 others
    val uncapped = Dedup.simhashNearDupDocs(docs, maxBucket = Int.MaxValue)
      .collect()
    assert(uncapped.length === 62)
    assert(uncapped.filter(_.getLong(0) <= 60L)
      .forall(_.getAs[Long]("n_near") === 59L))
  }

  test("bigram hit-rate: bounded, consistent with the top list, broadcast probe") {
    val out = TextAnalysis.bigramHitRate(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_bigrams"))
      val hr = r.getAs[Double]("hit_rate")
      assert(hr >= 0.0 && hr <= 1.0)
      assert(math.abs(hr - r.getAs[Long]("n_hits").toDouble /
        r.getAs[Long]("n_bigrams")) < 1e-12)
    }
    // the top-K list is bounded — the probe must be a broadcast join,
    // never a shuffle of the corpus bigram stream on the bigram key
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }

  test("decontam: a verbatim quote of an eval passage flags the train doc") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated words here nothing shared at all whatsoever friends"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (101L, "xx yy the quick brown fox jumps over zz ww"),
      (102L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.benchmarkDecontamDocs(train, eval).collect()
    assert(out.length === 1, "only the quoting doc is flagged")
    val r = out.head
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Long]("n_sh") === 6L)       // 10 tokens -> 6 distinct 5-grams
    assert(r.getAs[Long]("n_overlap") === 2L)  // the two 5-grams inside the quote
    assert(r.getAs[Long]("n_eval_docs") === 1L)
    assert(math.abs(r.getAs[Double]("overlap_ratio") - 2.0 / 6.0) < 1e-12)
  }

  test("decontam: eval-side hot-shingle cap ignores boilerplate, keeps real quotes") {
    import spark.implicits._
    // 6 eval docs share one boilerplate 5-gram (df=6 > cap=3); eval 201
    // additionally carries a unique passage
    val evalDocs = ((202 to 206).map(i =>
      (i.toLong, s"copyright notice all rights reserved u$i v$i")) :+
      (201L, "copyright notice all rights reserved unique passage about quantum gravity research"))
      .toDF("doc_id", "text")
    val train = Seq(
      // touches ONLY the boilerplate shingle
      (11L, "intro copyright notice all rights reserved outro"),
      // quotes eval 201's unique passage (2 shared 5-grams)
      (12L, "prefix unique passage about quantum gravity research suffix"))
      .toDF("doc_id", "text")
    val capped = Dedup.benchmarkDecontamDocs(train, evalDocs, maxEvalDf = 3)
      .collect()
    assert(capped.map(_.getAs[Long]("doc_id")).toSeq === Seq(12L),
      "boilerplate-only contact is not contamination; the real quote is")
    assert(capped.head.getAs[Long]("n_overlap") === 2L)
    assert(capped.head.getAs[Long]("n_eval_docs") === 1L)
    // uncapped, the boilerplate match also fires and touches all 6 evals
    val uncapped = Dedup.benchmarkDecontamDocs(train, evalDocs,
      maxEvalDf = Int.MaxValue).collect()
    assert(uncapped.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_eval_docs"))).toSet === Set((11L, 6L), (12L, 1L)))
  }
}
