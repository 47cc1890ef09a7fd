package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join family: the two-path salted join (hot keys salted, cold
  * majority plain, results unioned) and the zero-code AQE alternative.
  * Synthetic skew here — the TPC-H keys are deliberately uniform, so
  * q25's production call degenerates to the plain join (asserted
  * below) and the hot path needs a manufactured hot key.
  */
class SkewJoinSpec extends SparkSpec {

  /** fact: key 0 is hot (5 000 rows), keys 1..200 are cold (10 rows
    * each); `line_no` is the non-key discriminator the salt derives
    * from. dim: one payload row per key.
    */
  private def skewedFact: DataFrame = {
    val s = spark
    import s.implicits._
    val hot = s.range(5000).select(lit(0L).as("k"), col("id").as("line_no"))
    val cold = s.range(1, 201).crossJoin(s.range(10).select(col("id").as("j")))
      .select(col("id").as("k"), col("j").as("line_no"))
    hot.unionByName(cold)
  }

  private def dim: DataFrame =
    spark.range(0, 201).select(col("id").as("k"),
      concat(lit("p_"), col("id")).as("payload"))

  private def aggregate(joined: DataFrame): Seq[(String, Long)] =
    joined.groupBy("payload").agg(count(lit(1)).as("n"))
      .orderBy("payload")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("two-path join salts only the hot key and matches the plain join") {
    val plain = aggregate(skewedFact.join(dim, Seq("k")))
    val twoPath = SkewJoin.saltedJoinHotKeys(
      skewedFact, dim, "k", discriminator = col("line_no"), salts = 4,
      hotShare = 0.1)
    assert(aggregate(twoPath) === plain)
    // the hot path is actually taken: salt explode (Generate) + union
    // in the plan (the salt sequence constant-folds to an array literal)
    val p = twoPath.queryExecution.executedPlan.toString
    assert(p.contains("Union"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }

  test("no profiled hot keys degenerates to the plain join (no dim replication)") {
    val uniform = spark.range(2000)
      .select((col("id") % 200).as("k"), col("id").as("line_no"))
    val joined = SkewJoin.saltedJoinHotKeys(
      uniform, dim, "k", discriminator = col("line_no"), salts = 4,
      hotShare = 0.1)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), p.take(2000))
    assert(!p.contains("Union"), p.take(2000))
    assert(joined.count() === 2000)
  }

  test("explicit hot-key list spreads one key across all salt buckets") {
    val salted = SkewJoin.saltedJoinForKeys(
      skewedFact, dim, "k", discriminator = col("line_no"), salts = 4,
      hotKeys = Seq(0L))
    // every (key, payload) match survives: 5000 hot + 200*10 cold
    assert(salted.count() === 7000)
    // the hot key's rows really scatter: re-derive the salt and count
    // distinct buckets the hot rows landed in
    val buckets = skewedFact.filter(col("k") === 0L)
      .select(pmod(hash(col("line_no")), lit(4)).as("b"))
      .distinct().count()
    assert(buckets === 4L)
  }

  test("AQE splits the skewed sort-merge partition with zero code") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k)).toMap
    try {
      // thresholds sized to the synthetic data: the hot key's ~50k-row
      // partition (~100-char payload rows) is far above 64KB, the cold
      // partitions far below
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fat = spark.range(50000).select(
        lit(0L).as("k"), col("id").as("line_no"),
        lpad(col("id").cast("string"), 100, "x").as("pad"))
        .unionByName(spark.range(1, 201)
          .select(col("id").as("k"), lit(0L).as("line_no"),
            lit("c").as("pad")))
      val joined = fat.hint("merge").join(dim, Seq("k"))
      // materialize THIS QueryExecution (count() would build a new,
      // separate plan and leave this adaptive plan un-finalized)
      val qe = joined.queryExecution
      assert(qe.toRdd.count() === 50000 + 200)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
