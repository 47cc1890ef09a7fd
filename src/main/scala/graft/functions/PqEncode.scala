package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization encoder. Given a
  * vector, a LITERAL codebook (array of codeword vectors) and the
  * codeword ids, emits the argmin codeword id per subspace — the M
  * codes of the PQ compression — in ONE row-local fused loop.
  *
  * Why an expression and not a relational formulation: the join
  * shape ((corpus × codewords) exploded by subspace, then a min
  * aggregation) materializes |corpus|·|codes|·M rows through a shuffle
  * — 20M rows at sf0.1 and the single heaviest stage in the suite —
  * to compute something each row can answer alone against a ~32 KB
  * codebook. Same preference order as [[CosineSimilarity]]: native
  * codegen expression > relational detour > higher-order lambdas
  * (interpreted, one closure call per element) > UDF.
  *
  * Arithmetic contract (bit-identical to the relational version and
  * the DuckDB oracle): per (subspace, codeword),
  * dist = Σ_j r((v[p] − cw[p])·1e6)² over the subspace's dims, with
  * r = round-half-away-from-zero (Spark's ROUND / DuckDB's ROUND on
  * doubles — NOT Java's Math.round, which rounds -2.5 to -2); the
  * argmin folds as min(dist·1024 + codeId) with codeId < 1024, and
  * the emitted code is that min mod 1024.
  */
case class PqEncode(vec: Expression, codebook: Expression,
                    codeIds: Expression, m: Int)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = codebook
  override def third: Expression = codeIds

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType, codeIds.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<array<double>>, array<int>), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cb: Any, ids: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cw = cb.asInstanceOf[ArrayData]
    val code = ids.asInstanceOf[ArrayData]
    val dims = x.numElements()
    val w = dims / m
    val nCodes = cw.numElements()
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = Long.MaxValue
      var c = 0
      while (c < nCodes) {
        val row = cw.getArray(c)
        var dist = 0L
        var j = 0
        while (j < w) {
          val p = sub * w + j
          val d = (x.getDouble(p) - row.getDouble(p)) * 1000000.0
          val t = if (d < 0) -Math.round(-d) else Math.round(d)
          dist += t * t
          j += 1
        }
        val key = dist * 1024L + code.getInt(c)
        if (key < best) best = key
        c += 1
      }
      out(sub) = (best % 1024L).toInt
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, ids) => {
      val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val nc = ctx.freshName("nc")
      val best = ctx.freshName("best")
      val dist = ctx.freshName("dist")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val key = ctx.freshName("key")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      s"""
        int $w = $v.numElements() / $m;
        int $nc = $cb.numElements();
        int[] $out = new int[$m];
        for (int $sub = 0; $sub < $m; $sub++) {
          long $best = Long.MAX_VALUE;
          for (int $c = 0; $c < $nc; $c++) {
            org.apache.spark.sql.catalyst.util.ArrayData $row = $cb.getArray($c);
            long $dist = 0L;
            for (int $j = 0; $j < $w; $j++) {
              double $d = ($v.getDouble($sub * $w + $j) - $row.getDouble($sub * $w + $j)) * 1000000.0;
              long $t = $d < 0 ? -java.lang.Math.round(-$d) : java.lang.Math.round($d);
              $dist += $t * $t;
            }
            long $key = $dist * 1024L + (long) $ids.getInt($c);
            if ($key < $best) $best = $key;
          }
          $out[$sub] = (int) ($best % 1024L);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqEncode =
    copy(vec = newFirst, codebook = newSecond, codeIds = newThird)
}

object PqEncode {
  val name = "pq_encode"
  val info = new ExpressionInfo(classOf[PqEncode].getName, name)
}
