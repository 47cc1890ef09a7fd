package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row entering the top-k heap. */
final case class Scored(score: Double, id: Long)

/** Typed Aggregator computing per-group top-k (highest score, id as
  * tie-break) — the `Aggregator[IN,BUF,OUT]` surface (SURVEY.md §2.10).
  *
  * Why this exists next to the row_number() window formulation: a
  * window top-k must shuffle EVERY row of a group to one partition and
  * sort it; an Aggregator participates in partial aggregation — each
  * map task keeps only its local top-k, the shuffle carries k rows per
  * group per task, and merge() combines the bounded buffers. At
  * 100 TB with millions of rows per group, that is the difference
  * between a skew-prone sort and a fixed-size combine.
  *
  * The buffer is a k-bounded sorted Seq (k is small); ordering is
  * (-score, id) so results are deterministic under any merge order.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[Scored] = Nil

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)

  override def finish(r: Seq[Scored]): Seq[Scored] =
    r.sortBy(x => (-x.score, x.id))

  // ExpressionEncoder (not kryo): the output stays a queryable
  // array<struct<score,id>> column, and the buffer serializes columnar
  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
