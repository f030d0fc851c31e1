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

  final case class CountedStrings(n: Long, items: Seq[String])

  /** Bounded "total count + the k lexicographically-least DISTINCT strings"
    * aggregator — the state-bounded replacement for
    * `(count(*), slice(array_sort(collect_set(x)), 1, k))`, whose
    * collect_set state grows with DISTINCT-value diversity (a hub page
    * with millions of distinct anchor texts). Here partial aggregation
    * keeps ≤ k strings + one counter per group per partition, so both the
    * in-memory state and the shuffle bytes are bounded by k, never by
    * diversity. Ordering is byte-wise UTF-8 (UTF8String/DuckDB binary
    * collation — NOT Java's UTF-16 compareTo, which orders supplementary
    * characters differently), so results are bit-identical to the
    * collect_set formulation it replaces.
    */
  final class MinKDistinct(k: Int)
      extends Aggregator[String, (Long, List[String]), CountedStrings] {
    private def leq(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    private def insert(buf: List[String], in: String): List[String] =
      if (k <= 0) buf // legacy slice(sort(collect_set), 1, 0) → empty array
      else if (buf.contains(in)) buf
      else if (buf.length >= k && leq(in, buf.last) >= 0) buf
      else {
        val (smaller, rest) = buf.span(leq(_, in) < 0)
        (smaller ::: in :: rest).take(k)
      }
    override def zero: (Long, List[String]) = (0L, Nil)
    override def reduce(buf: (Long, List[String]), in: String): (Long, List[String]) =
      (buf._1 + 1, insert(buf._2, in))
    override def merge(a: (Long, List[String]), b: (Long, List[String])): (Long, List[String]) =
      (a._1 + b._1, b._2.foldLeft(a._2)(insert))
    override def finish(r: (Long, List[String])): CountedStrings =
      CountedStrings(r._1, r._2)
    override def bufferEncoder: Encoder[(Long, List[String])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[String])]()
    override def outputEncoder: Encoder[CountedStrings] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CountedStrings]()
  }

  /** Typed column: ds.groupByKey(...).mapValues(...).agg(minKDistinct(16)) */
  def minKDistinct(k: Int): TypedColumn[String, CountedStrings] =
    new MinKDistinct(k).toColumn
}
