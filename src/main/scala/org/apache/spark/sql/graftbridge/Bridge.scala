package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the sql-private Column ⇄ Expression conversions
  * (Spark 4 moved Column onto ColumnNode; ExpressionUtils is the
  * supported classic-session path but is private[sql], so extension
  * libraries expose it via a bridge in the sql package — the standard
  * pattern for custom-Expression libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an already-analyzed logical plan (the
    * private[sql] `Dataset.ofRows`) — what a command that captured a
    * resolved sub-plan (e.g. a MERGE source) uses to re-enter the
    * public Dataset API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-tag a batch DataFrame as a STREAMING one (the private[sql]
    * `internalCreateDataFrame(..., isStreaming = true)`): what a V1
    * streaming `Source.getBatch` must return — the engine asserts the
    * returned frame's logical plan is streaming.
    */
  def streamingFrom(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse of [[streamingFrom]]: re-anchor a streaming
    * micro-batch frame on its computed RDD as a plain BATCH frame —
    * what a V1 streaming `Sink.addBatch` needs before handing the
    * data to a batch write path.
    */
  def batchFrom(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
