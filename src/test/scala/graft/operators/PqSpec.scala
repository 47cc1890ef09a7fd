package graft.operators

import graft.SparkSpec

/** Product-quantization ANN: structural contract + recall floor vs the
  * exact brute-force ranking. (Value-level parity is the s7 DuckDB
  * oracle's job.)
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pq_encode expression matches a driver-side recompute (both eval paths)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val rnd = new scala.util.Random(11)
    val m = 4; val dims = 16; val nCodes = 5
    val cb = Seq.fill(nCodes)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
    val ids = Seq(8, 9, 10, 11, 12)
    // half-away-from-zero, matching Spark/DuckDB ROUND on doubles
    def r(x: Double): Long =
      if (x < 0) -Math.round(-x) else Math.round(x)
    def expected(v: Seq[Double]): Seq[Int] = (0 until m).map { sub =>
      val w = dims / m
      (0 until nCodes).map { c =>
        val dist = (0 until w).map { j =>
          val t = r((v(sub * w + j) - cb(c)(sub * w + j)) * 1000000.0)
          t * t
        }.sum
        dist * 1024L + ids(c)
      }.min % 1024L
    }.map(_.toInt)
    val conv = (x: Any) => CatalystTypeConverters.convertToCatalyst(x)
    for (_ <- 1 to 20) {
      val v = Seq.fill(dims)(rnd.nextDouble() * 2 - 1)
      // interpreted path: direct eval on Literal children
      val e = graft.functions.PqEncode(
        Literal(conv(v), ArrayType(DoubleType)),
        Literal(conv(cb), ArrayType(ArrayType(DoubleType))),
        Literal(conv(ids), ArrayType(IntegerType)), m)
      val got = e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got === expected(v), s"eval path diverged for $v")
    }
    // codegen path: run through a real plan over a non-literal column
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.functions.{col, typedLit}
    val vs = Seq.fill(10)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
    val encCol = Bridge.column(graft.functions.PqEncode(
      Bridge.expression(col("v")),
      Bridge.expression(typedLit(cb)),
      Bridge.expression(typedLit(ids)), m))
    val got = vs.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v").select(col("i"), encCol.as("codes"))
      .collect().sortBy(_.getInt(0))
      .map(_.getAs[scala.collection.Seq[Int]]("codes").toSeq)
    assert(got.toSeq === vs.map(expected), "codegen path diverged")
  }

  test("ivf_assign expression matches a driver-side recompute; ties break to the smallest label") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val rnd = new scala.util.Random(17)
    val dims = 16; val nCells = 6
    val cents = Seq.fill(nCells)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
    val labels = Seq(2, 3, 5, 7, 11, 13) // ascending, non-contiguous
    def r(x: Double): Long =
      if (x < 0) -Math.round(-x) else Math.round(x)
    def expected(v: Seq[Double]): Int = {
      val scores = cents.map(c =>
        (0 until dims).map(p => r((v(p) * c(p)) * 1000000000000.0)).sum)
      // argmax, first (smallest) label on ties — the relational
      // row_number over (desc score, asc label) pick
      labels(scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2)
    }
    val conv = (x: Any) => CatalystTypeConverters.convertToCatalyst(x)
    for (_ <- 1 to 20) {
      val v = Seq.fill(dims)(rnd.nextDouble() * 2 - 1)
      val e = graft.functions.IvfAssign(
        Literal(conv(v), ArrayType(DoubleType)),
        Literal(conv(cents), ArrayType(ArrayType(DoubleType))),
        Literal(conv(labels), ArrayType(IntegerType)))
      assert(e.eval(null) === expected(v), s"eval path diverged for $v")
    }
    // tie-break: two identical centroids — the smaller label must win
    val tieCents = Seq(cents.head, cents.head)
    val tie = graft.functions.IvfAssign(
      Literal(conv(cents.head), ArrayType(DoubleType)),
      Literal(conv(tieCents), ArrayType(ArrayType(DoubleType))),
      Literal(conv(Seq(4, 9)), ArrayType(IntegerType)))
    assert(tie.eval(null) === 4)
    // codegen path through a real plan over a non-literal column
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.functions.{col, typedLit}
    val vs = Seq.fill(10)(Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
    val cellCol = Bridge.column(graft.functions.IvfAssign(
      Bridge.expression(col("v")),
      Bridge.expression(typedLit(cents)),
      Bridge.expression(typedLit(labels))))
    val got = vs.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v").select(col("i"), cellCol.as("cell"))
      .collect().sortBy(_.getInt(0)).map(_.getInt(1)).toSeq
    assert(got === vs.map(expected), "codegen path diverged")
  }

  test("pq top-k: k rows per query, corpus-only ids, descending scores") {
    val rows = Similarity.knnPq(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 8)
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3))
      assert(g.forall(_.getAs[Long]("c_id") >= 8L), "queries never rank themselves")
      val scores = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score6")).toSeq
      assert(scores === scores.sorted.reverse, "ADC scores descend with rank")
    }
  }

  test("pq recall: majority overlap with exact brute-force top-5") {
    val brute = Similarity.knnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val pq = Similarity.knnPq(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("c_id")).toSet }
    val overlap = pq.map { case (q, ids) => ids.intersect(brute(q)).size }.sum
    // measured 17/24 on this corpus (deterministic); the floor leaves
    // slack only for intentional parameter retuning
    assert(overlap >= 12, s"ADC ranking degenerated: overlap $overlap/24")
  }
}
