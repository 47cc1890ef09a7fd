package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: IVF coarse-quantizer cell assignment.
  * Given a vector, a LITERAL centroid matrix (one full-dim centroid
  * per cell) and the cell labels, emits the argmax-dot-product label —
  * the cell id — in one row-local fused loop.
  *
  * Why an expression and not the relational formulation (the same
  * preference order as [[PqEncode]], which retired the suite's
  * heaviest stage with this exact move): posexplode(tall) ⋈ centroids
  * on pos → per-(vec, cell) SUM → per-vec window argmax materializes
  * |corpus|·dims·cells rows through two shuffles to answer a question
  * each row can answer alone against a ≤(cells·dims·8)-byte centroid
  * table — ~5 KB for the 10-label/64-dim corpus, collected once
  * (bounded, the PQ-codebook class of driver action).
  *
  * Arithmetic contract (identical to the relational version and the
  * DuckDB oracle): score(c) = Σ_p r((x[p]·mean[c][p])·1e12) as long,
  * with r = round-half-away-from-zero (Spark ROUND on doubles — NOT
  * Java's Math.round, which sends -2.5 to -2); argmax broken toward
  * the SMALLEST label, exactly the relational
  * `row_number over (desc score, asc label)` pick. `labels` must be
  * ascending for the tie-break scan to match.
  */
case class IvfAssign(vec: Expression, centroids: Expression,
                     labels: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = centroids
  override def third: Expression = labels

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, centroids.dataType, labels.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<array<double>>, array<int>), got ($a, $b, $c)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "ivf_assign"

  override def nullSafeEval(v: Any, cents: Any, labs: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cw = cents.asInstanceOf[ArrayData]
    val lab = labs.asInstanceOf[ArrayData]
    val dims = x.numElements()
    val nCells = cw.numElements()
    var bestScore = Long.MinValue
    var bestLabel = 0
    var c = 0
    while (c < nCells) {
      val row = cw.getArray(c)
      var score = 0L
      var p = 0
      while (p < dims) {
        val d = (x.getDouble(p) * row.getDouble(p)) * 1000000000000.0
        score += (if (d < 0) -Math.round(-d) else Math.round(d))
        p += 1
      }
      if (score > bestScore) { bestScore = score; bestLabel = lab.getInt(c) }
      c += 1
    }
    bestLabel
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents, labs) => {
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val dims = ctx.freshName("dims")
      val nc = ctx.freshName("nc")
      val bestS = ctx.freshName("bestS")
      val bestL = ctx.freshName("bestL")
      val score = ctx.freshName("score")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      s"""
        int $dims = $v.numElements();
        int $nc = $cents.numElements();
        long $bestS = Long.MIN_VALUE;
        int $bestL = 0;
        for (int $c = 0; $c < $nc; $c++) {
          org.apache.spark.sql.catalyst.util.ArrayData $row = $cents.getArray($c);
          long $score = 0L;
          for (int $p = 0; $p < $dims; $p++) {
            double $d = ($v.getDouble($p) * $row.getDouble($p)) * 1000000000000.0;
            $score += $d < 0 ? -java.lang.Math.round(-$d) : java.lang.Math.round($d);
          }
          if ($score > $bestS) { $bestS = $score; $bestL = $labs.getInt($c); }
        }
        ${ev.value} = $bestL;
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IvfAssign =
    copy(vec = newFirst, centroids = newSecond, labels = newThird)
}

object IvfAssign {
  val name = "ivf_assign"
  val info = new ExpressionInfo(classOf[IvfAssign].getName, name)
}
