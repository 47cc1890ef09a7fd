package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * file-level skipping on MORE THAN ONE column.
  *
  * A sort on `a` gives tight per-file min/max for `a` and useless
  * (full-range) stats for `b`; any predicate on `b` alone scans every
  * file. Interleaving the bits of both keys puts rows close in
  * (a, b)-space into the same files, so BOTH columns get narrow
  * per-file ranges and 2-d box predicates (or either single dimension)
  * skip most files from parquet footer stats alone — the layout trick
  * behind Delta/Iceberg Z-ordering, and the difference between
  * scanning one file and 10 TB at warehouse scale.
  *
  * The z-value is pure bit arithmetic (shift/and/or), codegen'd, and
  * recomputable verbatim in DuckDB — so the transform carries a
  * hash-checked oracle row (`z1_zvalue`) like any other operator.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of k non-negative int
    * columns: bit i of column j lands at position i·k + j, so every
    * dimension gets equal weight at every scale (k·bits ≤ 63 — the
    * value must fit a long). k = 2 reproduces the classic 2-d
    * interleave bit-for-bit.
    */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValueN needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} columns × $bits bits exceeds a long (max 63 total)")
    val k = cols.size
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ + _)
  }

  /** The 2-d interleave: bit i of `a` at position 2i, of `b` at
    * 2i+1. 16+16 bits → a 32-bit z-value in a long.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Write `df` Z-ordered on (a, b): range-partition by z (sampled
    * balanced ranges, the distributed total-order primitive), sort
    * within partitions, drop the helper column. One shuffle; each
    * output file covers a compact z-range ⇒ compact (a, b) box.
    */
  def writeZOrdered(df: DataFrame, a: String, b: String, out: String,
                    nFiles: Int = 8, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)

  /** Oracle-checked z-value transform over a deterministic lineitem
    * slice: keys folded to 16 bits, interleaved. (The WRITE path is
    * exercised by LayoutSpec's file-skipping assertions; this query
    * pins the bit arithmetic itself against DuckDB.)
    */
  def zValueQuery(s: SparkSession, d: String): DataFrame = {
    val a = (col("l_partkey") % 65536L).as("a")
    val b = (col("l_suppkey") % 65536L).as("b")
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), a, b)
      .withColumn("z", zValue(col("a"), col("b")))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** DuckDB twin of [[zValueN]] over column expressions. */
  def zValueSqlN(cols: Seq[String], bits: Int = 16): String = {
    val k = cols.size
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      s"((($c >> $i) & 1) << ${i * k + j})").mkString(" + ")
  }

  /** DuckDB twin of [[zValue]] over column expressions `a`/`b`. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    zValueSqlN(Seq(a, b), bits)
}
