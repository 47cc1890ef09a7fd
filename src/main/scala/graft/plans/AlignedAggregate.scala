package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.{GraftRelation, Snapshots}

/** SQL surface for the storage-partitioned grouped aggregation (the
  * [[AlignedJoin]] rule's sibling): `SELECT k, count/sum/min/max ...
  * FROM graft_table GROUP BY k` where the table is bucket-clustered on
  * `k` rewrites to [[Snapshots.bucketAlignedAggregate]]'s zero-Exchange
  * per-bucket streaming fold — every key's rows already co-locate in
  * one bucket, so the planner's two-phase hash aggregate with its
  * exchange is pure waste. Semantics are the aligned aggregate's
  * documented contract, which is Spark's own: result types (count →
  * long, integral sums → long with ANSI-loud overflow, fractional →
  * double, decimal → decimal(p+10)), SQL NULL handling (NULL keys form
  * one group, sums/min/max skip NULLs, all-NULL → NULL), verified by a
  * result-schema guard at rewrite time — any mismatch leaves the
  * planner's aggregate untouched.
  *
  * Narrow by construction, like the join rule:
  *  - the child is a bare graft relation or one under the pure
  *    attribute-projection ColumnPruning inserts (no Filter: a
  *    pre-aggregation filter cannot hoist above a fold — windowed
  *    aggregation stays on the Scala `ranges` API until the filter
  *    shapes are condition-matched here);
  *  - exactly ONE grouping expression: the table's bucket-key
  *    attribute;
  *  - every aggregate is a non-DISTINCT, un-FILTERed Complete
  *    `count(*) | count(c) | sum(c) | min(c) | max(c)` on a plain
  *    column (or the grouping attribute itself in the select list).
  * Disable with `graft.sql.alignedAgg.enabled = false`.
  */
case class AlignedAggregate(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("graft.sql.alignedAgg.enabled")
      .forall(_.trim.equalsIgnoreCase("true"))

  private def graftRel(p: LogicalPlan): Option[GraftRelation] = p match {
    case l @ LogicalRelation(g: GraftRelation, _, _, _, _)
        if l.output.map(_.name) == g.schema.fields.toSeq.map(_.name) =>
      Some(g)
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      graftRel(child)
    case _ => None
  }

  /** The bucket-clustered precondition (the aligned aggregate's own
    * refusals, probed without throwing) — memoized per (dir, version,
    * key) through the shared [[AlignedPlanCache]], so fixed-point
    * iterations and repeat queries never re-parse a snapshot.
    */
  private def alignable(g: GraftRelation, key: String): Boolean =
    AlignedPlanCache.sideFacts.getOrElseUpdate(
      (g.tableDir, g.version, key),
      try {
        import org.apache.spark.sql.types.{DoubleType, FloatType}
        val m = Snapshots.readManifest(spark, g.tableDir, g.version)
        m.bucketSpec.collect {
          case (bk, n) if bk == key &&
              m.files.forall(m.buckets.contains) => n
        }.flatMap(n => m.schema.map(_(key).dataType)
          .filter(kt => kt != DoubleType && kt != FloatType)
          .map(kt => (n, kt)))
      } catch { case scala.util.control.NonFatal(_) => None }).isDefined

  /** One SELECT-list item translated to the aligned vocabulary:
    * Left(groupKey) for the grouping attribute itself, Right((fn,
    * col, outAttr)) for a supported aggregate. None → the rule bails.
    */
  private def item(e: NamedExpression, key: AttributeReference)
      : Option[Either[Attribute, (String, String, Attribute)]] = e match {
    case a: AttributeReference if a.exprId == key.exprId => Some(Left(a))
    // `GROUP BY k` selected as `k AS alias` — still the key column
    case al @ Alias(a: AttributeReference, _) if a.exprId == key.exprId =>
      Some(Left(al.toAttribute))
    case al @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
      fn match {
        case Count(Seq(Literal(1, _))) =>
          Some(Right(("count", "*", al.toAttribute)))
        case Count(Seq(c: AttributeReference)) =>
          Some(Right(("count", c.name, al.toAttribute)))
        case Sum(c: AttributeReference, _) =>
          Some(Right(("sum", c.name, al.toAttribute)))
        case Min(c: AttributeReference) =>
          Some(Right(("min", c.name, al.toAttribute)))
        case Max(c: AttributeReference) =>
          Some(Right(("max", c.name, al.toAttribute)))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(Seq(key: AttributeReference), aggExprs, child,
          None)
          if graftRel(child).isDefined &&
            aggExprs.forall(item(_, key).isDefined) &&
            aggExprs.exists(item(_, key).exists(_.isRight)) =>
        val g = graftRel(child).get
        if (!alignable(g, key.name)) agg
        else {
          val items = aggExprs.map(item(_, key).get)
          val specs = items.collect { case Right(sp) => sp }
          val keyItems = items.collect { case Left(a) => a }
          // each aggregate keyed by a positional alias; the Project
          // below restores the select list's own names and order
          val alignedOpt = scala.util.Try(Snapshots.bucketAlignedAggregate(
            spark, g.tableDir,
            specs.zipWithIndex.map { case ((fn, c, _), i) =>
              (fn, c, s"__agg_$i") },
            version = Some(g.version))).toOption
          // result-schema guard: every aggregate's type must be the
          // planner's own, or the rewrite silently changes the query's
          // schema — bail instead
          val typesOk = alignedOpt.exists { a =>
            val aSchema = a.schema
            specs.zipWithIndex.forall { case ((_, _, out), i) =>
              aSchema(1 + i).dataType == out.dataType } &&
              aSchema(0).dataType == key.dataType
          }
          // the key can be selected at most once (an RDD column binds
          // ONE attribute; `SELECT k, k AS k2` is the planner's)
          if (!typesOk || keyItems.size > 1) agg
          else {
            val aligned = alignedOpt.get
            // LogicalRDD output = (key, spec results...) carrying the
            // AGGREGATE's own attribute identities (the key under its
            // select-list alias when present), then re-project to the
            // original select-list order
            val rddOut: Seq[Attribute] =
              keyItems.headOption.getOrElse(key) +: specs.map(_._3)
            val full = LogicalRDD(rddOut, aligned.queryExecution.toRdd,
              org.apache.spark.sql.catalyst.plans.physical
                .UnknownPartitioning(0),
              Nil, isStreaming = false, None)(
              spark.asInstanceOf[
                org.apache.spark.sql.classic.SparkSession],
              None, None)
            if (agg.output == rddOut) full
            else Project(agg.output.map(a => a: NamedExpression), full)
          }
        }
    }
  }
}
