package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level semantics of the MERGE/CDC apply operator. */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  test("applyChanges: insert, update, delete, untouched — all exact") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      (2L, "b2", 22.0, "U"),  // update
      (3L, "c", 30.0, "D"),   // delete
      (9L, "z", 99.0, "I"))   // insert
      .toDF("k", "v", "x", "op")
    val got = Merge.applyChanges(base, changes, "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "z", 99.0)))
  }

  test("applyChanges: rejects a change batch without op or payload") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val noOp = Seq((1L, "a")).toDF("k", "v")
    assert(intercept[IllegalArgumentException] {
      Merge.applyChanges(base, noOp, "k")
    }.getMessage.contains("op column"))
    val noPayload = Seq((1L, "U")).toDF("k", "op")
    assert(intercept[IllegalArgumentException] {
      Merge.applyChanges(base, noPayload, "k")
    }.getMessage.contains("payload"))
  }

  test("u2 merge audit: row count moves by inserts minus deletes") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, sf)
    val n = orders.count()
    val nDel = orders.filter(col("o_orderkey") % 97 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 13 === 0).count()
    val merged = Merge.u2MergeUpsert(spark, sf)
      .agg(sum("n_orders")).collect().head.getLong(0)
    assert(merged === n - nDel + nIns)
  }
}
