package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs.
  *
  * `orderBy(desc).limit(k)` already plans TakeOrderedAndProject
  * (per-partition heaps + driver merge) and is the right default
  * (SURVEY.md §7.5); this Aggregator is the *grouped* form — top-k
  * WITHIN each group of a `groupByKey`, where a global sort-limit
  * doesn't apply and a window + filter would sort every group fully.
  * State is O(k) per group, merge is associative — partial aggregation
  * applies map-side.
  */
class TopKAggregator(k: Int) extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    // O(1) reject for the common case: a full buffer whose worst entry
    // already beats the incoming row (same result, no re-sort per row)
    if (buf.size == k && (buf.last._1 > in._2 || (buf.last._1 == in._2 && buf.last._2 <= in._1))) buf
    else trim(buf :+ ((in._2, in._1)))

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
