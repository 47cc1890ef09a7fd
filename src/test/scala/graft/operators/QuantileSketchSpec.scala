package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x3's accuracy and mergeability contracts — the two claims the
  * DuckDB oracle cannot express: the histogram estimate sits within
  * two bin widths of the EXACT interpolated percentile, and partial
  * histograms built over an arbitrary corpus split merge to exactly
  * the direct histogram (addition is the whole merge).
  */
class QuantileSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("histogram estimates within 2 bins of the exact interpolated percentile") {
    val est = CorpusQueries.x3QuantileSketch(spark, sf)
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("ex_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("ex_p95"))
    val joined = est.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p50, p95) = (r.getAs[Double]("est_p50"), r.getAs[Double]("est_p95"))
      val (e50, e95) = (r.getAs[Double]("ex_p50"), r.getAs[Double]("ex_p95"))
      assert(math.abs(p50 - e50) <= 1024.0, s"p50 off for ${r.get(0)}: $p50 vs $e50")
      assert(math.abs(p95 - e95) <= 1024.0, s"p95 off for ${r.get(0)}: $p95 vs $e95")
    }
  }

  test("count-min sketch: estimate >= exact for EVERY key (one-sided guarantee)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // skewed corpus: key k appears ~1/(k+1) as often as key 0
    val rows = (0 until 20000).map(_ => rnd.nextInt(1 + rnd.nextInt(200)).toLong)
    val df = rows.toDF("user_id")
    val (w, dRows) = (1024L, 3)
    val bins = array((0 until dRows).map(j =>
      pmod(xxhash64(lit(j), col("user_id")), lit(w))): _*)
    val cms = df.select(posexplode(bins).as(Seq("j", "bin")))
      .groupBy("j", "bin").agg(count(lit(1)).as("cnt"))
    val exact = df.groupBy("user_id").agg(count(lit(1)).as("n"))
    val est = exact.select(col("user_id"), col("n"),
        posexplode(bins).as(Seq("j", "bin")))
      .join(cms, Seq("j", "bin"))
      .groupBy("user_id", "n").agg(min("cnt").as("est"))
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"CMS under-counted key ${r.get(0)}")
    }
  }

  test("partials over a random split merge to the direct histogram") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 120000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bin = least(floor(col("v") / lit(512.0)), lit(255L)).cast("int").as("bin")
    // split on an arbitrary hash; partials per split half, then merged
    val merged = df.withColumn("half", pmod(xxhash64(col("id")), lit(2L)))
      .groupBy(col("half"), bin).agg(count(lit(1)).as("cnt"))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    val direct = df.groupBy(bin).agg(count(lit(1)).as("cnt"))
    val m = merged.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dd = direct.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m === dd)
  }
}
