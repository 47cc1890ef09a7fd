package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge
import graft.sources.{GraftCatalog, GraftCatalogTable, GraftSource, Snapshots}

/** Name-based access to [[graft.sources.GraftCatalog]] tables, kept on
  * the V1 serving surface: the catalog resolves `graft.db.t` to a
  * DSv2 relation over the metadata-only [[GraftCatalogTable]]; this
  * rule swaps it during resolution for the [[GraftRelation]] scan —
  * REUSING the v2 relation's output attributes, so every reference
  * the analyzer already bound stays bound. Catalog tables thereby get
  * the exact same path as `USING graft` views: vectorized parquet
  * scan, manifest pruning, DV masks, ledger counts
  * ([[MetadataOnlyCount]]), and row-level SQL DML ([[GraftSqlDml]] —
  * its rule runs post-hoc, after this one has already produced the V1
  * relation it matches on).
  *
  * Writes (`INSERT INTO` / `INSERT OVERWRITE` / CTAS by name) land as
  * leaf commands over [[Snapshots.commit]]: one atomic snapshot
  * commit each, partitioned per the table's declared spec.
  */
object GraftCatalogRules {

  case class V2ToV1(spark: SparkSession) extends Rule[LogicalPlan] {

    private def graftTable(p: LogicalPlan): Option[GraftCatalogTable] =
      p match {
        case r: DataSourceV2Relation => r.table match {
          case t: GraftCatalogTable => Some(t)
          case _ => None
        }
        case SubqueryAlias(_, child) => graftTable(child)
        case _ => None
      }

    private def isTrue(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Boolean = e match {
      case Literal(true, _) => true
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      // relations that are the target of a v2 write this rule has not
      // handled YET (append/overwrite before output resolution): left
      // un-swapped, so the write either matches its own case on a
      // later pass or is refused explicitly below — swapping the
      // relation out from under a pending v2 write would strand the
      // v2 command over a V1 relation and surface as a confusing
      // analysis failure instead of a clean error
      val pendingWriteTargets: Set[LogicalPlan] = plan.collect {
        case a: AppendData if !a.outputResolved => a.table
        case o: OverwriteByExpression if !o.outputResolved => o.table
      }.toSet
      plan.resolveOperatorsDown {
        case a @ AppendData(rel, query, _, _, _, _)
            if graftTable(rel).isDefined && a.outputResolved =>
          val t = graftTable(rel).get
          GraftCatalogWrite(t.dir, t.partitionCols, t.bucketSpec,
            t.tableSchema, query, mode = "append")
        case o @ OverwriteByExpression(rel, cond, query, _, _, _, _)
            if graftTable(rel).isDefined && o.outputResolved && isTrue(cond) =>
          val t = graftTable(rel).get
          GraftCatalogWrite(t.dir, t.partitionCols, t.bucketSpec,
            t.tableSchema, query, mode = "overwrite")
        // the v2 write shapes this rule does NOT support are refused
        // with a clean error (instead of the relation swap leaving a
        // half-converted plan): a static PARTITION spec arrives as a
        // conditional OverwriteByExpression, dynamic partition
        // overwrite mode as OverwritePartitionsDynamic
        case o @ OverwriteByExpression(rel, cond, _, _, _, _, _)
            if graftTable(rel).isDefined && o.outputResolved && !isTrue(cond) =>
          throw new UnsupportedOperationException(
            "graft INSERT OVERWRITE supports only a full-table overwrite; " +
              "a static PARTITION spec is not supported — use DELETE FROM + " +
              "INSERT INTO (row-level DML) for a partition-scoped rewrite")
        case o: OverwritePartitionsDynamic if graftTable(o.table).isDefined =>
          throw new UnsupportedOperationException(
            "graft tables do not support dynamic partition overwrite " +
              "(spark.sql.sources.partitionOverwriteMode=dynamic); use a " +
              "full INSERT OVERWRITE, or MERGE INTO for a partial rewrite")
        case ctas @ CreateTableAsSelect(
            ResolvedIdentifier(catalog: GraftCatalog, ident),
            partitioning, query, _, _, ifNotExists, _)
            if query.resolved =>
          GraftCtas(catalog, ident, partitioning, query, ifNotExists)
        case rtas @ ReplaceTableAsSelect(
            ResolvedIdentifier(catalog: GraftCatalog, ident),
            partitioning, query, _, _, orCreate, _)
            if query.resolved =>
          // REPLACE = a fresh table definition: the registry entry is
          // recreated (history restarts — matching the statement's
          // semantics; an in-place redefinition is INSERT OVERWRITE)
          GraftRtas(catalog, ident, partitioning, query, orCreate)
        case TruncateTable(org.apache.spark.sql.catalyst.analysis
            .ResolvedTable(catalog: GraftCatalog, _, t: GraftCatalogTable, _)) =>
          GraftTruncate(t)
        case r: DataSourceV2Relation
            if graftTable(r).isDefined && !pendingWriteTargets.contains(r) =>
          val t = graftTable(r).get
          val opts = Map("path" -> t.dir) ++
            t.versionAsOf.map(v => "versionAsOf" -> v.toString)
          val base = new GraftSource().createRelation(
            spark.sqlContext, opts)
          LogicalRelation(base, r.output, None, isStreaming = false, None)
        // `spark.readStream.table("graft.db.t")` — the catalog's table
        // handle carries no DSv2 streaming capability (deliberately:
        // the streaming read IS the V1 GraftStreamSource), so the v2
        // streaming relation the analyzer produces is swapped for the
        // V1 StreamingRelation over the same source `readStream
        // .format("graft").load(dir)` resolves to. Reader options
        // (changeFeed, maxVersionsPerTrigger) ride through; base
        // output attributes are REUSED so bound references stay bound
        // (changeFeed appends the source's `_change_type` column,
        // new to the plan by construction).
        case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
            if s.table.isInstanceOf[GraftCatalogTable] =>
          val t = s.table.asInstanceOf[GraftCatalogTable]
          require(t.versionAsOf.isEmpty,
            "VERSION/TIMESTAMP AS OF does not compose with a streaming read")
          import scala.jdk.CollectionConverters._
          val opts = Map("path" -> t.dir) ++
            s.extraOptions.asCaseSensitiveMap().asScala.toMap
          val cdc = opts.exists { case (k, v) =>
            k.equalsIgnoreCase("changefeed") && v.trim.equalsIgnoreCase("true")
          }
          val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
            if (cdc) s.output :+ org.apache.spark.sql.catalyst.expressions
              .AttributeReference("_change_type",
                org.apache.spark.sql.types.StringType)()
            else s.output
          Bridge.streamingRelation(spark, "graft", opts, output)
      }
    }
  }

  /** INSERT INTO / OVERWRITE a catalog table: one snapshot commit,
    * partitioned per the table's spec; the aligned query's columns are
    * renamed positionally to the table's (the analyzer's output
    * resolution already cast and ordered them).
    */
  case class GraftCatalogWrite(dir: String, partitionCols: Seq[String],
                               bucketSpec: Option[(String, Int)],
                               tableSchema: org.apache.spark.sql.types.StructType,
                               query: LogicalPlan, mode: String)
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      val df = Bridge.ofRows(spark, query)
        .toDF(tableSchema.fieldNames.toIndexedSeq: _*)
      Snapshots.commit(df, dir, mode, partitionBy = partitionCols,
        bucketBy = bucketSpec)
      Seq.empty
    }
  }

  /** CREATE TABLE ... USING graft AS SELECT: empty declaration +
    * first append, both through the catalog/commit path. A query that
    * fails AFTER the registry entry appeared drops the entry again —
    * CTAS must not leave an orphan empty table behind.
    */
  case class GraftCtas(catalog: GraftCatalog, ident: Identifier,
                       partitioning: Seq[Transform], query: LogicalPlan,
                       ifNotExists: Boolean)
      extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      if (catalog.tableExists(ident)) {
        if (ifNotExists) return Seq.empty
        else throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
      }
      val df = Bridge.ofRows(spark, query)
      val t = catalog.createTable(ident, df.schema, partitioning.toArray,
        java.util.Collections.emptyMap[String, String]())
        .asInstanceOf[GraftCatalogTable]
      try Snapshots.commit(df, t.dir, "append", partitionBy = t.partitionCols,
        bucketBy = t.bucketSpec)
      catch { case e: Throwable => catalog.dropTable(ident); throw e }
      Seq.empty
    }
  }

  /** REPLACE TABLE [OR CREATE] ... AS SELECT: recreate the registry
    * entry (REPLACE without OR CREATE requires the table to exist).
    * ATOMIC against query failure: the replacement is fully written
    * into a registry-invisible staging dir first and only swapped in
    * after the SELECT succeeded — a failure mid-write leaves the
    * original table, with its entire version history, untouched
    * (a drop-then-recreate would have already destroyed both).
    */
  case class GraftRtas(catalog: GraftCatalog, ident: Identifier,
                       partitioning: Seq[Transform], query: LogicalPlan,
                       orCreate: Boolean) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(spark: SparkSession): Seq[Row] = {
      if (!catalog.tableExists(ident)) {
        if (!orCreate)
          throw new org.apache.spark.sql.catalyst.analysis
            .NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
        // nothing to protect: plain CTAS (with its own failure cleanup)
        return GraftCtas(catalog, ident, partitioning, query,
          ifNotExists = false).run(spark)
      }
      val df = Bridge.ofRows(spark, query)
      val (partCols, bucketSpec) = catalog.layoutOf(partitioning)
      val staging = catalog.newStagingDir(ident)
      try {
        // same two-commit shape as CTAS (empty declaration + first
        // append), so version arithmetic is identical either way
        Snapshots.createEmpty(spark, staging.toString, df.schema, partCols,
          bucketSpec)
        Snapshots.commit(df, staging.toString, "append", partitionBy = partCols,
          bucketBy = bucketSpec)
        catalog.promoteStaging(ident, staging)
      } catch {
        case e: Throwable => catalog.discardStaging(staging); throw e
      }
      Seq.empty
    }
  }

  /** TRUNCATE TABLE: one empty-overwrite snapshot commit — the rows
    * are gone from the new version, prior versions still time-travel
    * (truncation is a data change, not a registry change).
    */
  case class GraftTruncate(t: GraftCatalogTable) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], t.tableSchema)
      Snapshots.commit(empty, t.dir, "overwrite",
        partitionBy = t.partitionCols, bucketBy = t.bucketSpec)
      Seq.empty
    }
  }
}
