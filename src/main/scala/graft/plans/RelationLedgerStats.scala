package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.GraftRelation

/** Surfaces the manifest ledger's EXACT row count through the V1
  * statistics path: `LogicalRelation.computeStats` consults its
  * CatalogTable's stats before falling back to sizeInBytes-only, so
  * attaching a synthetic CatalogTable carrying (bytes, rows) lets
  * cost-based join reordering and any cardinality-driven planning see
  * ROW COUNTS, not just volume — `spark.sql.cbo.enabled` (or plan
  * stats) gates how much Spark's own `toPlanStats` exposes, exactly
  * as for an ANALYZEd catalog table. The byte figure is the same
  * compression-factored ledger sum [[GraftRelation.sizeInBytes]]
  * serves, so auto-broadcast behavior is unchanged.
  *
  * Runs in the operator-optimization batch (before Join Reorder,
  * which is what consumes the row counts); idempotent — only
  * relations without a catalogTable are touched, and only when the
  * ledger actually knows the count (manifests predating row
  * accounting are left alone).
  */
case class RelationLedgerStats(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case lr @ LogicalRelation(g: GraftRelation, _, None, _, _)
          if g.ledgerCount.isDefined =>
        // per-column NDV from the manifest's mergeable HLL sketches
        // (only columns every live file carries a sketch for): the
        // distinctCount CBO's join-reorder cardinality model keys on,
        // exactly what ANALYZE TABLE ... FOR COLUMNS would have
        // computed — served from metadata, no scan
        val colStats = g.columnNdvs.map { case (c, ndv) =>
          c -> org.apache.spark.sql.catalyst.catalog.CatalogColumnStat(
            distinctCount = Some(BigInt(ndv)))
        }
        lr.copy(catalogTable = Some(CatalogTable(
          identifier = TableIdentifier(
            s"graft_${Integer.toHexString(g.tableDir.hashCode)}"),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = g.schema,
          provider = Some("graft"),
          stats = Some(CatalogStatistics(
            sizeInBytes = BigInt(g.sizeInBytes),
            rowCount = g.ledgerCount.map(BigInt(_)),
            colStats = colStats)))))
    }
}
