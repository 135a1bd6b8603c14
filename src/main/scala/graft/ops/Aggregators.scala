package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` exemplars (SURVEY.md §2.9 — the reference needs no
  * custom UDAF, but per-group top-k is the one aggregation Spark's built-ins
  * can't do without a window sort, and it matters at scale).
  */
object Aggregators {

  /** One scored row inside a top-k buffer. */
  final case class Scored(score: Double, id: Long)

  /** Per-group top-k by (score desc, id asc) as a partially-aggregable
    * Aggregator.
    *
    * Why not `row_number().over(Window.partitionBy(g).orderBy(...))`? The
    * window plan shuffles and sorts EVERY row of every group; this buffer
    * caps at k rows per group in the map-side partial aggregation, so the
    * shuffle carries at most k rows per (partition, group) — the same
    * partial/final split Catalyst gives `max()`, applied to a k-element
    * state. Both merge and reduce are commutative/associative, so the result
    * is partitioning-independent and deterministic (total order via the id
    * tie-break).
    */
  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def ord: Ordering[Scored] =
      Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
      else buf
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: ExpressionEncoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: ExpressionEncoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: `topK(3)(col(score), col(id))` →
    * `array<struct<score,id>>` of the group's top 3. */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopK(k), ExpressionEncoder[Scored]())
}
