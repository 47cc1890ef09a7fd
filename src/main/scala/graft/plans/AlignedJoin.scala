package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.sources.{GraftRelation, Snapshots}

/** SQL surface for the storage-partitioned join (VERDICT r15 task #3):
  * an optimizer rule that recognizes `graft ⋈ graft` single-key INNER
  * equi-joins whose two sides are bucket-clustered ON THE JOIN KEYS
  * with the same modulus and fully clustered, and replaces the Join
  * with [[Snapshots.bucketAlignedJoin]]'s zero-Exchange per-bucket zip
  * — so the flagship shuffle-free path is reachable from pure SQL
  * (`SELECT * FROM graft.db.a JOIN graft.db.b ON a.k = b.k`), not just
  * the Scala API. Semantics are identical BY the join's own contract:
  * inner equi-join, SQL NULL never matches; the rewrite only changes
  * the physical strategy, exactly the decision Spark's own storage-
  * partitioned join makes for DSv2 sources that report compatible
  * KeyGroupedPartitioning.
  *
  * Deliberately narrow — the rule fires ONLY when every precondition
  * is checkable and met, and leaves the plan untouched otherwise (the
  * planner's join is always correct, just shuffled):
  *  - both sides are graft relations, bare or under the pure
  *    attribute-projection ColumnPruning inserts (a FILTERED side
  *    belongs to the planner until the aligned family's range
  *    windows are condition-matched here);
  *  - the condition is a single `l.k = r.k` between attributes of the
  *    two sides, no join hint;
  *  - both manifests carry the bucket layout on the join keys with
  *    equal bucket counts, every file clustered, non-float keys of
  *    one type.
  * A fire replaces the Join with a [[LogicalRDD]] carrying the JOIN'S
  * OWN output attributes (left then right, the aligned join's exact
  * column order), so everything bound above stays bound. Disable with
  * `graft.sql.alignedJoin.enabled = false`.
  *
  * At 100 TB this is the difference between a SQL analyst's fact⋈fact
  * query shuffling both tables and reading them in place: zero network
  * bytes for table data, one task per bucket.
  */
case class AlignedJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("graft.sql.alignedJoin.enabled")
      .forall(_.trim.equalsIgnoreCase("true"))

  /** A side the rewrite can serve: a bare graft relation, or one
    * under a pure attribute-projection (what ColumnPruning inserts
    * beneath a join when the SELECT list needs fewer columns — the
    * aligned join reads the full schema either way; the surviving
    * Project above the replacement re-prunes). Returns the relation
    * and its FULL output attributes (the aligned join's exact column
    * order).
    */
  private def graftRel(p: LogicalPlan): Option[(GraftRelation, Seq[Attribute])] =
    p match {
      case l @ LogicalRelation(g: GraftRelation, _, _, _, _)
          if l.output.map(_.name) == g.schema.fields.toSeq.map(_.name) =>
        Some((g, l.output))
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        graftRel(child)
      case _ => None
    }

  /** The precondition probe — THIN manifest facts only (bucket spec,
    * schema, ledger), no per-file walk beyond what the join itself
    * will do: both sides clustered on their join key, same modulus,
    * fully clustered files, one non-float key type.
    */
  private def alignable(lg: GraftRelation, lKey: String,
                        rg: GraftRelation, rKey: String): Boolean = try {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val lm = Snapshots.readManifest(spark, lg.tableDir, lg.version)
    val rm = Snapshots.readManifest(spark, rg.tableDir, rg.version)
    (lm.bucketSpec, rm.bucketSpec) match {
      case (Some((lk, ln)), Some((rk, rn))) =>
        lk == lKey && rk == rKey && ln == rn &&
          lm.files.forall(lm.buckets.contains) &&
          rm.files.forall(rm.buckets.contains) &&
          lm.schema.exists { ls =>
            rm.schema.exists { rs =>
              val kt = ls(lKey).dataType
              kt == rs(rKey).dataType &&
                kt != DoubleType && kt != FloatType
            }
          }
      case _ => false
    }
  } catch { case scala.util.control.NonFatal(_) => false }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case j @ Join(lp, rp, Inner, Some(EqualTo(
          a: AttributeReference, b: AttributeReference)), JoinHint.NONE) =>
        (graftRel(lp), graftRel(rp)) match {
          case (Some((lg, lOut)), Some((rg, rOut))) =>
            // orient the equality's ends to their sides
            val lIds = lOut.map(_.exprId).toSet
            val rIds = rOut.map(_.exprId).toSet
            val oriented =
              if (lIds.contains(a.exprId) && rIds.contains(b.exprId))
                Some((a.name, b.name))
              else if (lIds.contains(b.exprId) && rIds.contains(a.exprId))
                Some((b.name, a.name))
              else None
            oriented match {
              case Some((lKey, rKey))
                  if alignable(lg, lKey, rg, rKey) =>
                val aligned = Snapshots.bucketAlignedJoin(spark,
                  lg.tableDir, rg.tableDir, lKey, rKey,
                  leftVersion = Some(lg.version),
                  rightVersion = Some(rg.version))
                // the aligned output is left fields then right fields
                // (the relations' FULL attributes); re-project to the
                // Join's own output — same exprIds (a pruning Project
                // only forwards attributes), so references above stay
                // bound and the pruned shape survives
                val full = LogicalRDD(lOut ++ rOut,
                  aligned.queryExecution.toRdd,
                  org.apache.spark.sql.catalyst.plans.physical
                    .UnknownPartitioning(0),
                  Nil, isStreaming = false, None)(
                  spark.asInstanceOf[
                    org.apache.spark.sql.classic.SparkSession],
                  None, None)
                if (j.output == full.output) full
                else Project(j.output, full)
              case _ => j
            }
          case _ => j
        }
    }
  }
}
