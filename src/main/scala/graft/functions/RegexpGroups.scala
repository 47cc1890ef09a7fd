package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: match `pattern` (a constant, anchored
  * grammar) against a string ONCE and return ALL capture groups as an
  * array — NULL when the line doesn't match.
  *
  * Why it exists: Spark has no multi-group extraction, so a
  * seven-field record parser written with builtins executes the same
  * compiled regex eight times per line (one `rlike` prefilter + one
  * `regexp_extract` per group — Catalyst does not share Matcher state
  * across distinct expressions). On a 100 TB raw-log scan the regex
  * IS the dominant map-stage cost, so this expression collapses those
  * eight executions into one `matches()` call per line, with the
  * match-failure branch doubling as the malformed-line drop
  * (`isNotNull` replaces the rlike prefilter). Participates in
  * whole-stage codegen (doGenCode below), pattern compiled once per
  * plan via a reference object.
  *
  * Semantics: `Matcher.matches()` (whole-string) — identical to an
  * anchored `^...$` pattern under rlike/regexp_extract `find()`. A
  * group that did not participate in the match yields a NULL element
  * (hence containsNull = true).
  */
case class RegexpGroups(child: Expression, pattern: String)
  extends UnaryExpression {

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "regexp_groups"

  override def nullable: Boolean = true // no-match → NULL

  override def nullSafeEval(s: Any): Any = {
    val m = compiled.matcher(s.asInstanceOf[UTF8String].toString)
    if (!m.matches()) null
    else {
      val n = m.groupCount()
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val patternRef = ctx.addReferenceObj("graftRegexpGroups", compiled,
        classOf[java.util.regex.Pattern].getName)
      val m = ctx.freshName("matcher")
      val arr = ctx.freshName("groups")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val n = ctx.freshName("n")
      s"""
        java.util.regex.Matcher $m = $patternRef.matcher($s.toString());
        if (!$m.matches()) {
          ${ev.isNull} = true;
        } else {
          int $n = $m.groupCount();
          Object[] $arr = new Object[$n];
          for (int $i = 0; $i < $n; $i++) {
            String $g = $m.group($i + 1);
            $arr[$i] = $g == null ? null :
              org.apache.spark.unsafe.types.UTF8String.fromString($g);
          }
          ${ev.value} =
            new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RegexpGroups =
    copy(child = newChild)
}
