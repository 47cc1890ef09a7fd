package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for the round-3 operators: temporal joins,
  * deterministic sampling/splits, repetition profiling, salted join,
  * and the typed top-k aggregator query.
  */
class TemporalSamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("as-of join: one row per purchase, carried click is at-or-before") {
    val rows = TemporalJoins.asofPurchaseClick(spark, sf).collect()
    val nPurchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong === nPurchases)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("click_ts"))) {
        assert(!r.getAs[java.sql.Timestamp]("click_ts")
          .after(r.getAs[java.sql.Timestamp]("purchase_ts")))
        assert(r.getAs[Long]("gap_us") >= 0L)
      }
    }
  }

  test("general asofJoin: carries latest right row, equal-ts rights visible") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // left: (event_id, user_id, ts); right: (event_id, user_id, ts, price)
    val left = Seq((10L, 1L, ts(5)), (11L, 1L, ts(1)), (12L, 2L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts(2), 100.0),  // before left#10, after left#11
      (2L, 1L, ts(5), 200.0),  // same ts as left#10, smaller tie id... (2 < 10)
      (3L, 3L, ts(0), 999.0)   // other key
    ).toDF("event_id", "user_id", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right,
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
        carry = Seq("price"))
      .select("event_id", "asof_price")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(10L) === Some(200.0), "equal-ts right with smaller tie id is visible")
    assert(out(11L) === None, "no right row at-or-before")
    assert(out(12L) === None, "right rows never cross keys")
  }

  test("range join: every purchase kept; clicks counted only in-window") {
    val df = TemporalJoins.rangeJoinFollowups(spark, sf)
    val nPurchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() === nPurchases)
    // purchases with zero follow-ups have null click_value
    assert(df.filter(col("n_clicks") === 0 && col("click_value").isNotNull).isEmpty)
  }

  test("split assignment is deterministic and respects bucket boundaries") {
    val a = Sampling.splitAssign(spark, sf).collect()
    val b = Sampling.splitAssign(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "hash split must be reproducible")
    a.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < 100)
      val expected =
        if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(r.getAs[String]("split") === expected)
    }
    // roughly 80/10/10 (hash-uniform; generous tolerance on 500 docs)
    val frac = a.count(_.getAs[String]("split") == "train").toDouble / a.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("stratified sample: per-stratum counts bounded and deterministic") {
    val rows = Sampling.stratifiedSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
    }
  }

  test("reservoir sample: exactly n per stratum, deterministic, stable under repartition") {
    val n = 5
    val a = Sampling.reservoirSample(spark, sf, n).collect()
    a.groupBy(_.getAs[String]("source")).values.foreach { g =>
      assert(g.length === n, "every stratum yields exactly n rows")
      assert(g.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to n))
    }
    // content-hash ranking: the chosen SET may not depend on physical layout
    val b = Sampling.reservoirSample(spark, sf, n).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("repetition: top token accounts for a (0,1] fraction of the doc") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("top_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("top_count") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("typed top-k aggregator plans as ObjectHashAggregate (partial agg)") {
    val df = CorpusQueries.q24TopKAgg(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    val rows = df.collect()
    rows.groupBy(_.getAs[String]("l_returnflag")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to g.length))
      // scores weakly decrease with rank
      val byRank = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("qty")).toSeq
      assert(byRank === byRank.sorted.reverse)
    }
  }

  test("salted join result is identical to the plain join") {
    val salted = CorpusQueries.q25SaltedJoin(spark, sf).collect()
    val plain = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("price_sum"))
      .orderBy("o_orderpriority")
      .collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("pivot yields one stable column per event type with zero-fill") {
    val df = CorpusQueries.q22Pivot(spark, sf)
    assert(df.columns.toSeq === Seq("day", "click", "view", "purchase", "error"))
    assert(df.filter(col("click").isNull).isEmpty)
  }
}
