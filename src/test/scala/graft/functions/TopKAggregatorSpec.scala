package graft.functions

import graft.SparkSpec
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The map-side-combinable top-k Aggregator equals the window
  * formulation; the salted join equals the plain join.
  */
class TopKAggregatorSpec extends SparkSpec {

  test("udaf top-k == row_number window top-k (same set, same order)") {
    import spark.implicits._
    val topk = udaf(new TopKAggregator(3))
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice").as("score"),
        col("o_orderkey").as("id"))

    val viaAgg = df
      .groupBy("o_custkey")
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("o_custkey"), (col("i") + 1).as("rank"),
        col("s.id").as("id"), col("s.score").as("score"))

    val w = Window.partitionBy("o_custkey").orderBy(desc("score"), asc("id"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("id"), col("score"))

    val a = viaAgg.orderBy("o_custkey", "rank").collect()
    val b = viaWindow.orderBy("o_custkey", "rank").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("aggregator merge is deterministic under any partitioning") {
    import spark.implicits._
    val topk = udaf(new TopKAggregator(2))
    val data = Seq((1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 7.0, 12L), (1L, 3.0, 13L))
    val one = data.toDF("g", "score", "id").repartition(1)
      .groupBy("g").agg(topk(col("score"), col("id")).as("t")).collect()
    val many = data.toDF("g", "score", "id").repartition(7)
      .groupBy("g").agg(topk(col("score"), col("id")).as("t")).collect()
    assert(one.head.getSeq[Any](1) === many.head.getSeq[Any](1))
  }

  test("salted join == plain join (row multiset)") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"))
      .groupBy("o_custkey").count()
    val salted = SkewJoin.saltedJoinAll(fact, dim, "o_custkey",
      discriminator = col("o_orderkey"), salts = 8)
      .groupBy("o_custkey").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
