package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (fixed-seed) semantics checks: the generic SCD2 and
  * MERGE operators against independent driver-side reference
  * implementations over many random inputs — the operator's contract
  * holds on shapes no hand-written fixture thought of.
  */
class RandomizedSemanticsSpec extends SparkSpec {

  import spark.implicits._

  test("scd2 equals a driver-side reference over random event streams") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val events = (1 to 200).map { i =>
        (rnd.nextInt(8).toLong,                       // user
          ("ABC" (rnd.nextInt(3))).toString,          // attr
          rnd.nextInt(50).toLong,                     // ts seconds
          i.toLong)                                   // unique tie
      }
      val df = events.toDF("user_id", "event_type", "secs", "event_id")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
      val got = History.scd2(df, "user_id", "event_type", "ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getAs[Int]("version"), r.getString(2),
          r.getAs[java.sql.Timestamp]("effective_from").getTime / 1000,
          Option(r.getAs[java.sql.Timestamp]("effective_to"))
            .map(_.getTime / 1000)))
        .toSet
      // reference: sort per user by (ts, tie), collapse equal-attr runs
      val want = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._4))
        val runs = sorted.foldLeft(List.empty[(String, Long)]) {
          case (acc, (_, a, t, _)) =>
            if (acc.headOption.exists(_._1 == a)) acc
            else (a, t) :: acc
        }.reverse
        runs.zipWithIndex.map { case ((a, t), i) =>
          val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
          (u, i + 1, a, t, to)
        }
      }.toSet
      assert(got === want)
    }
  }

  test("plan shapes: scd2 windows share one shuffle; pipeline scans once") {
    val sf = "/root/testdata/sf0.001"
    // u1: change detection + validity bounds reuse the same (user_id)
    // clustering — exactly 2 exchanges (window + final orderBy)
    val u1 = History.scd2History(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange".r.findAllIn(u1).size
    assert(exchanges <= 2, s"scd2 shuffled more than designed:\n$u1")
    // pipe1: the map-side quality cascade means ONE documents scan
    val p1 = Pipeline.trainingManifest(spark, sf).queryExecution.executedPlan
    val docScans = p1.collectLeaves()
      .count(_.toString.contains("documents.parquet"))
    assert(docScans === 1, "manifest must not re-scan the corpus")
    // k1: top-k of the skew profile is TakeOrderedAndProject
    val k1 = CorpusQueries.k1SkewProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(k1.contains("TakeOrderedAndProject"), k1.take(2000))
    // d8: the df count is an aggregation over keyed joins, never a
    // cartesian pair space
    val d8 = Dedup.dupPassages(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!d8.contains("CartesianProduct") &&
      !d8.contains("BroadcastNestedLoopJoin"), "d8 must stay keyed")
  }

  test("merge equals a driver-side reference over random change batches") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val base = (0 until 60).map(k => (k.toLong, rnd.nextInt(100)))
      val keys = rnd.shuffle(base.map(_._1)).take(30)
      val (delKeys, rest) = keys.splitAt(10)
      val (updKeys, _) = rest.splitAt(10)
      val insKeys = (100 until 110).map(_.toLong)
      val changes =
        delKeys.map(k => (k, 0, "D")) ++
          updKeys.map(k => (k, rnd.nextInt(100), "U")) ++
          insKeys.map(k => (k, rnd.nextInt(100), "I"))
      val got = Merge.applyChanges(
        base.toDF("k", "v"), changes.toDF("k", "v", "op"), "k")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val cm = changes.map(c => c._1 -> c).toMap
      val want = (base.filterNot(b => cm.get(b._1).exists(_._3 == "D"))
        .map(b => cm.get(b._1).filter(_._3 == "U")
          .map(c => (c._1, c._2)).getOrElse(b)) ++
        changes.filter(_._3 == "I").map(c => (c._1, c._2))).toSet
      assert(got === want)
    }
  }
}
