package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native cosine expression: numerically identical to the
  * higher-order fold, registered in SQL via GraftExtensions, and
  * running inside whole-stage codegen (doGenCode path, not the
  * interpreted fallback).
  */
class CosineSimilaritySpec extends SparkSpec {

  test("bit-identical to the higher-order aggregate/zip_with fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(-1.0, 0.5, 2.0)),
      (Array(0.1, -0.2, 0.3), Array(0.1, -0.2, 0.3)),
      (Array(1e-7, 2e-7, -3e-7), Array(5.0, -4.0, 3.0))
    ).toDF("a", "b")
    import org.apache.spark.sql.graftbridge.Bridge
    val rows = df.select(
      Bridge.column(CosineSimilarity(
        Bridge.expression(col("a")), Bridge.expression(col("b")))).as("native"),
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
          lit(0.0), (s, x) => s + x)) *
         sqrt(aggregate(zip_with(col("b"), col("b"), (x, y) => x * y),
           lit(0.0), (s, x) => s + x)))).as("hof")
    ).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // identical vectors → exactly 1.0 within fp of norm product
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("callable from SQL via GraftExtensions registration") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(r === 1.0)
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // parquet-backed input: a local literal would be constant-folded into
    // a LocalTableScan before any codegen stage exists
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
      .selectExpr("cosine_sim(v, v) AS c")
    // codegen stages print as "*(id)" in executedPlan; the cosine_sim
    // Project must be starred (the transform() lambda Project, by
    // contrast, is interpreted and unstared — exactly why the native
    // expression exists)
    val plan = df.queryExecution.executedPlan.toString
    val cosLine = plan.linesIterator.find(_.contains("cosine_sim")).get.trim
    assert(cosLine.startsWith("*("), plan)
    // self-cosine == 1 (within fp of the norm product) via the generated path
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
  }
}
