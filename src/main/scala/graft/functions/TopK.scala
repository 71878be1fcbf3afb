package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap grouped top-k `Aggregator` (SURVEY.md §2.J UDAF surface,
  * §4.3): per group keep the k largest (score, id) pairs. State is O(k)
  * per group on every partition, merged pairwise — the scale-safe
  * replacement for `row_number().over(Window)` + filter, which must sort
  * every group. Register with `udaf(...)` for SQL use or call
  * `.toColumn` on typed Datasets.
  *
  * Input (score, id); output ranked ids, highest score first, ties by
  * smaller id (matching the window-function contract used by q_topk).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  require(k > 0)

  // buffer: descending-sorted, ≤ k elements; ordering: score desc, id asc
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && !lt(in, buf.last)) buf
    else {
      val idx = buf.indexWhere(e => lt(in, e)) match {
        case -1 => buf.length
        case i => i
      }
      val withIn = (buf.take(idx) :+ in) ++ buf.drop(idx)
      if (withIn.length > k) withIn.take(k) else withIn
    }
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** String-keyed bounded-heap bottom-k: per group keep the k (key, id)
  * pairs with the SMALLEST keys (key asc, ties by smaller id), emitting
  * ids in that order. The [[TopKAggregator]] twin for orderings that
  * live on a string key — e.g. the md5-hex bottom-k sample, whose
  * lexicographic hash order a double score can't carry exactly (a
  * 128-bit hash doesn't fit a 53-bit mantissa; truncating reorders
  * near-ties). Same scale shape: O(k) state per group on every
  * partition, merged pairwise — replaces a `row_number()` window that
  * would sort whole strata serially when the stratum key has few
  * values. */
class BottomKStringAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[Long]] {

  require(k > 0)

  // buffer: ascending-sorted, <= k elements; ordering: key asc, id asc
  private def lt(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] = {
    if (buf.length >= k && !lt(in, buf.last)) buf
    else {
      val idx = buf.indexWhere(e => lt(in, e)) match {
        case -1 => buf.length
        case i => i
      }
      val withIn = (buf.take(idx) :+ in) ++ buf.drop(idx)
      if (withIn.length > k) withIn.take(k) else withIn
    }
  }

  override def finish(buf: Seq[(String, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
