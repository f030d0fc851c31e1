package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k highest-scoring (id, score) pairs per
  * group in a bounded buffer (binary-heap semantics via a sorted array —
  * k is small). This is the scale path for per-probe top-k: partial
  * aggregation keeps ≤ k rows per partition per group, so the shuffle
  * carries O(groups · k), not O(groups · N) like a window row_number —
  * the difference between shuffling 1000·k rows and 100 TB of scored pairs.
  *
  * Ordering: score DESC, then id ASC (deterministic tie-break, same
  * convention as [[graft.query.Retrieval.knn]]).
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  final class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    override def zero: List[Scored] = Nil
    override def reduce(buf: List[Scored], in: Scored): List[Scored] = insert(buf, in)
    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)
    private def insert(buf: List[Scored], in: Scored): List[Scored] = {
      // buf kept sorted best-first, length ≤ k
      if (buf.length >= k && !lt(in, buf.last)) buf
      else {
        val (better, worse) = buf.span(lt(_, in))
        (better ::: in :: worse).take(k)
      }
    }
    override def finish(r: List[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Typed column: ds.groupByKey(...).agg(topK(5)) */
  def topK(k: Int): TypedColumn[Scored, Seq[Scored]] = new TopK(k).toColumn
}
