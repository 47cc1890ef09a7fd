package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.GraftRelation

/** Catalyst optimizer rule: serve `SELECT COUNT(*)` over a graft
  * relation from the manifest ledger — zero file reads, zero Spark
  * jobs' worth of scan. The SQL-surface twin of
  * [[graft.sources.Snapshots.fastCount]] (u23): `fastCount` is an API
  * call; this makes the same O(manifest) answer automatic for every
  * `spark.sql("SELECT COUNT(*) FROM view")` and `df.count()` against
  * `format("graft")` — the lakehouse metadata-only-query optimization
  * re-expressed as a 40-line `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions` (the idiomatic Spark extension point; no
  * fork, no reflection).
  *
  * The rewrite fires ONLY when it is provably exact:
  *   - ungrouped Aggregate whose every output is a bare COUNT(*)
  *     (no DISTINCT, no FILTER clause, no other aggregates),
  *   - over the relation with nothing between them but aliases and
  *     projections (row-count-preserving by construction; a Filter
  *     blocks the rewrite),
  *   - and the pinned snapshot's manifest carries known row
  *     accounting (dataRows/dvRows ≥ 0 — the ledger the randomized
  *     protocol spec proves exact on every commit interleaving).
  * The relation pinned its version at creation, so the manifest is
  * immutable and the served count can never race a concurrent commit.
  */
case class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The graft relation under row-count-preserving wrappers, if any. */
  private def underlying(plan: LogicalPlan): Option[GraftRelation] = plan match {
    case SubqueryAlias(_, child) => underlying(child)
    case Project(_, child)       => underlying(child)
    case l: LogicalRelation =>
      l.relation match {
        case g: GraftRelation => Some(g)
        case _                => None
      }
    case _ => None
  }

  private def isBareCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) => true
        case _                         => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall(isBareCountStar) =>
      underlying(agg.child).flatMap(_.ledgerCount) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }
}
