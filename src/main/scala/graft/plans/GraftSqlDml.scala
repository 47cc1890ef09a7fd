package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.graftbridge.Bridge
import graft.sources.{GraftRelation, Snapshots}

/** SQL row-level DML on graft tables: routes `DELETE FROM`, `UPDATE`
  * and `MERGE INTO` statements over a `USING graft` relation to the
  * snapshot layer's merge-on-read machinery
  * ([[Snapshots.deleteWhere]] / [[Snapshots.updateWhere]] /
  * [[Snapshots.mergeOnRead]]), so a SQL-only consumer has the full
  * mutation surface the Scala API exposes — the statements the
  * reference's SQL-speaking serving clients (`serve/api.py:33-41`)
  * would reach for against a mutable lake.
  *
  * Installed as a post-hoc resolution rule ([[graft.GraftExtensions]]):
  * Spark's parser already produces `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` and its analyzer resolves their expressions
  * against the relation generically; without this rule checkAnalysis
  * then refuses them for non-DSv2 tables. The rule intercepts the
  * RESOLVED plans first and rewrites each into a leaf command that
  * executes as one atomic snapshot commit (O(matched) deletion-vector
  * mask + appended payloads — never a table rewrite; CHECK
  * constraints and the CAS publish apply exactly as in the Scala
  * path).
  *
  * Captured expressions are re-anchored by NAME (resolved attribute →
  * `UnresolvedAttribute`) before re-entering the DataFrame API: the
  * command plans a fresh scan of the table at execution time, whose
  * attribute ids necessarily differ from the ones the analyzer bound
  * against the statement's own relation instance.
  */
object GraftSqlDml {

  /** Unwraps view/alias layers down to a graft V1 relation. */
  private[plans] object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(LogicalRelation, String)] =
      plan match {
        case SubqueryAlias(_, child) => unapply(child)
        case v: View => unapply(v.child)
        case r @ LogicalRelation(g: GraftRelation, _, _, _, _) =>
          Some((r, g.tableDir))
        case _ => None
      }
  }

  /** Resolved attribute → plain-name reference (optionally qualified),
    * restricted to the given id set so a mixed-scope expression (MERGE
    * actions see both sides) re-anchors each side correctly.
    */
  private def byName(e: Expression,
                     sides: Seq[(Set[org.apache.spark.sql.catalyst.expressions.ExprId], Seq[String])])
      : Column =
    Bridge.column(e.transform {
      case a: AttributeReference =>
        sides.collectFirst {
          case (ids, qualifier) if ids.contains(a.exprId) =>
            UnresolvedAttribute(qualifier :+ a.name)
        }.getOrElse(a)
    })

  private def assignmentName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"graft SQL DML supports only top-level column assignments, got $other")
  }

  /** Demo + oracle entry (`u31_sql_dml`): the u9 (DV delete), u20
    * (row-level UPDATE) and u11 (merge-on-read MERGE) protocols
    * replayed through PURE SQL — `DELETE FROM`, `UPDATE ... SET`,
    * `MERGE INTO` against `USING graft` views, no Scala snapshot API
    * anywhere in the mutation loop (the seed is a fixture clone —
    * `u30_sql_insert` already exercises the public write API;
    * `latestVersion` appears only in the read-only `n_versions` audit
    * column proving one atomic commit per statement). Views pin their creation-time snapshot, so each
    * read re-resolves through a fresh view; every statement mutates
    * the table's LATEST version regardless of the issuing view's pin.
    * The oracle replays the three mutations relationally.
    */
  def u31SqlDml(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val dir = graft.sources.DemoFixtures.clonedOrders(s, d, "graft-sql-dml")
    s.sql("CREATE OR REPLACE TEMPORARY VIEW sqldml " +
      s"USING graft OPTIONS (path '$dir')")
    // u9 through SQL: a deletion-vector mask (the %10=4 tenth — the
    // op classes are what is under test, not mask volume; demo-sized
    // slices keep the driver bench honest)
    s.sql("DELETE FROM sqldml WHERE o_orderkey % 10 = 4")
    // u20 through SQL: +100 on the %10=6 tenth, mask + re-append
    s.sql("UPDATE sqldml SET o_totalprice = o_totalprice + 100 " +
      "WHERE o_orderkey % 10 = 6")
    // u11 through SQL: one CDC MERGE — U doubles the %20=1 prices,
    // D drops the %20=2 keys, I re-keys the %20=3 rows high
    s.sql("CREATE OR REPLACE TEMPORARY VIEW sqldml2 " +
      s"USING graft OPTIONS (path '$dir')")
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sqldml_src AS
        |SELECT o_orderkey AS k, 'U' AS what, o_totalprice * 2 AS newprice
        |FROM sqldml2 WHERE o_orderkey % 20 = 1
        |UNION ALL
        |SELECT o_orderkey, 'D', CAST(0.0 AS DOUBLE) FROM sqldml2
        |WHERE o_orderkey % 20 = 2
        |UNION ALL
        |SELECT o_orderkey + 4000000000, 'I', o_totalprice FROM sqldml2
        |WHERE o_orderkey % 20 = 3""".stripMargin)
    s.sql(
      """MERGE INTO sqldml2 t USING sqldml_src s ON t.o_orderkey = s.k
        |WHEN MATCHED AND s.what = 'D' THEN DELETE
        |WHEN MATCHED AND s.what = 'U' THEN UPDATE SET o_totalprice = s.newprice
        |WHEN NOT MATCHED AND s.what = 'I' THEN INSERT
        |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |   o_orderpriority)
        |  VALUES (s.k, CAST(1 AS BIGINT), 'N', s.newprice,
        |   DATE'2026-01-01', 'MERGED')""".stripMargin)
    val nVersions = Snapshots.latestVersion(s, dir).get + 1
    s.sql("CREATE OR REPLACE TEMPORARY VIEW sqldml3 " +
      s"USING graft OPTIONS (path '$dir')")
    s.sql(
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         |  CAST($nVersions AS INT) AS n_versions
         |FROM sqldml3 GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin)
  }

  /** The analyzer rule: resolved DML plan → graft leaf command. */
  case class Dml(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsDown {
        case d @ DeleteFromTable(GraftTarget(rel, dir), cond) if d.resolved =>
          GraftDeleteCommand(dir, rel.output, cond)
        case u @ UpdateTable(GraftTarget(rel, dir), assignments, cond)
            if u.childrenResolved &&
              assignments.forall(_.resolved) && cond.forall(_.resolved) =>
          GraftUpdateCommand(dir, rel.output, assignments, cond)
        case m @ MergeIntoTable(GraftTarget(rel, dir), source, cond,
            matched, notMatched, notMatchedBySource, _)
            if m.childrenResolved && cond.resolved &&
              (matched ++ notMatched ++ notMatchedBySource).forall(_.resolved) =>
          GraftMergeCommand(dir, rel.output, source, cond,
            matched, notMatched, notMatchedBySource)
      }
  }

  /** `DELETE FROM t WHERE p` → deletion-vector mask commit. */
  case class GraftDeleteCommand(tableDir: String, targetOutput: Seq[Attribute],
                                cond: Expression) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val ids = targetOutput.map(_.exprId).toSet
      Snapshots.deleteWhere(spark, tableDir, byName(cond, Seq(ids -> Nil)))
      Seq.empty
    }
  }

  /** `UPDATE t SET ... WHERE p` → mask + re-append commit. Assignment
    * values are cast to the column's declared type (SQL literals carry
    * their own narrower types; the snapshot layer's same-type contract
    * would otherwise refuse e.g. an int literal into a bigint column).
    */
  case class GraftUpdateCommand(tableDir: String, targetOutput: Seq[Attribute],
                                assignments: Seq[Assignment],
                                cond: Option[Expression])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val ids = targetOutput.map(_.exprId).toSet
      val one = Seq(ids -> (Nil: Seq[String]))
      val sets = assignments.map { a =>
        assignmentName(a) -> byName(a.value, one).cast(a.key.dataType)
      }.toMap
      val predicate = cond.map(byName(_, one)).getOrElse(lit(true))
      Snapshots.updateWhere(spark, tableDir, predicate, sets)
      Seq.empty
    }
  }

  /** `MERGE INTO t USING s ON t.k = s.k WHEN ...` → one merge-on-read
    * commit via [[Snapshots.mergeOnRead]]. Supported shape is the CDC
    * merge the snapshot layer's change contract defines:
    *
    *   - ON is a single equality between one target and one source
    *     column (the merge key — mergeOnRead masks by key, so a wider
    *     condition could mask rows the extra conjuncts exclude);
    *   - at most one UPDATE and one DELETE among WHEN MATCHED (each
    *     with an optional AND), at most one INSERT among WHEN NOT
    *     MATCHED; WHEN NOT MATCHED BY SOURCE is not supported;
    *   - the UPDATE may not reassign the merge key (that is a
    *     delete+insert, not an update);
    *   - at most one surviving change per key (the SQL MERGE
    *     cardinality rule), validated before anything is written.
    *
    * The command builds the I/U/D change batch with one source⟕target
    * join (action conditions and payloads evaluate in the joined
    * scope, so partial SETs read unchanged columns from the target)
    * and hands it to mergeOnRead — O(changes) appended bytes plus the
    * stats/bucket-pruned provenance mask, never a table rewrite.
    */
  case class GraftMergeCommand(tableDir: String, targetOutput: Seq[Attribute],
                               source: LogicalPlan, mergeCond: Expression,
                               matchedActions: Seq[MergeAction],
                               notMatchedActions: Seq[MergeAction],
                               notMatchedBySourceActions: Seq[MergeAction])
      extends LeafRunnableCommand {

    override def run(spark: SparkSession): Seq[Row] = {
      require(notMatchedBySourceActions.isEmpty,
        "graft MERGE does not support WHEN NOT MATCHED BY SOURCE")
      val tgtIds = targetOutput.map(_.exprId).toSet
      val srcIds = source.output.map(_.exprId).toSet
      val (tKey, sKey) = mergeCond match {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference)
            if tgtIds.contains(a.exprId) && srcIds.contains(b.exprId) =>
          (a.name, b.name)
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            b: AttributeReference, a: AttributeReference)
            if tgtIds.contains(a.exprId) && srcIds.contains(b.exprId) =>
          (a.name, b.name)
        case other => throw new UnsupportedOperationException(
          "graft MERGE requires ON <target.key> = <source.key> " +
            s"(single same-type equality), got: ${other.sql}")
      }
      val sides = Seq(tgtIds -> Seq("__t"), srcIds -> Seq("__s"))
      def rw(e: Expression): Column = byName(e, sides)
      def actCond(c: Option[Expression]): Column = c.map(rw).getOrElse(lit(true))

      val updateAction = matchedActions.collect {
        case a: UpdateAction => a: MergeAction
        case a: UpdateStarAction => a: MergeAction
      }
      val deleteAction = matchedActions.collect { case a: DeleteAction => a }
      val insertAction = notMatchedActions.collect {
        case a: InsertAction => a: MergeAction
        case a: InsertStarAction => a: MergeAction
      }
      require(updateAction.size <= 1 && deleteAction.size <= 1 &&
        insertAction.size <= 1 &&
        matchedActions.size == updateAction.size + deleteAction.size &&
        notMatchedActions.size == insertAction.size,
        "graft MERGE supports at most one UPDATE and one DELETE matched " +
          "action and one INSERT not-matched action")
      updateAction.foreach {
        case UpdateAction(_, assigns, _) =>
          // `SET *` expands to key = source.key, which is a no-op for
          // matched rows (they are equal by the ON clause) — only a
          // REAL reassignment (any other value) is a delete+insert in
          // disguise and refused
          val reassigned = assigns.filter(assignmentName(_) == tKey).exists {
            a => a.value match {
              case ar: AttributeReference =>
                !(srcIds.contains(ar.exprId) && ar.name == sKey) &&
                  !(tgtIds.contains(ar.exprId) && ar.name == tKey)
              case _ => true
            }
          }
          require(!reassigned,
            s"graft MERGE UPDATE may not reassign the merge key '$tKey'")
        case _ => ()
      }

      val tgt = spark.read.format("graft").load(tableDir).as("__t")
      val src = Bridge.ofRows(spark, source).as("__s")
      val joined = src.join(tgt, col(s"__s.$sKey") === col(s"__t.$tKey"), "left")
      val isMatched = col(s"__t.$tKey").isNotNull

      // first-matching-action op, in statement order; no action → null
      // → the row is excluded (its target row stays untouched)
      val opCol = {
        val whens: Seq[(Column, String)] =
          matchedActions.map {
            case DeleteAction(c) => (isMatched && actCond(c)) -> "D"
            case UpdateAction(c, _, _) => (isMatched && actCond(c)) -> "U"
            case UpdateStarAction(c) => (isMatched && actCond(c)) -> "U"
            case other => throw new UnsupportedOperationException(
              s"unsupported matched action: $other")
          } ++ insertAction.map {
            case InsertAction(c, _) => (!isMatched && actCond(c)) -> "I"
            case InsertStarAction(c) => (!isMatched && actCond(c)) -> "I"
            case other => throw new UnsupportedOperationException(
              s"unsupported not-matched action: $other")
          }
        whens.foldLeft(null: Column) {
          case (null, (c, v)) => when(c, lit(v))
          case (acc, (c, v)) => acc.when(c, lit(v))
        }
      }

      def updValue(name: String): Column = updateAction.headOption match {
        case Some(UpdateAction(_, assigns, _)) =>
          assigns.find(assignmentName(_) == name)
            .map(a => rw(a.value)).getOrElse(col(s"__t.$name"))
        case Some(UpdateStarAction(_)) => col(s"__s.$name")
        case _ => lit(null)
      }
      def insValue(name: String): Column = insertAction.headOption match {
        case Some(InsertAction(_, assigns)) =>
          assigns.find(assignmentName(_) == name)
            .map(a => rw(a.value)).getOrElse(lit(null))
        case Some(InsertStarAction(_)) => col(s"__s.$name")
        case _ => lit(null)
      }
      // payloads cast to the declared column type (same reasoning as
      // UPDATE's); D rows need only a valid key for the mask join
      val payload = tgt.schema.fields.map { f =>
        val base =
          if (f.name == tKey)
            when(col("__op") === "I", insValue(f.name))
              .otherwise(col(s"__s.$sKey"))
          else
            when(col("__op") === "U", updValue(f.name))
              .when(col("__op") === "I", insValue(f.name))
        base.cast(f.dataType).as(f.name)
      }
      val changes = joined
        .withColumn("__op", opCol)
        .filter(col("__op").isNotNull)
        .select(payload.toIndexedSeq :+ col("__op").as("op"): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // SQL MERGE cardinality rule, on the SURVIVING changes: two
        // changes for one key would mask once and append twice
        val dup = changes.groupBy(col(tKey)).count()
          .filter(col("count") > 1).limit(1).count()
        require(dup == 0L,
          s"MERGE produced more than one change for a '$tKey' key " +
            s"(source rows must match at most one action per key)")
        if (!changes.isEmpty)
          Snapshots.mergeOnRead(spark, tableDir, changes, tKey)
      } finally changes.unpersist(false)
      Seq.empty
    }
  }
}
