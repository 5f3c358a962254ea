package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Top-k per key as an aggregation instead of a window.
  *
  * `row_number().over(partitionBy(key).orderBy(ord))` shuffles EVERY row of
  * every group and sorts whole partitions before discarding all but k —
  * at 100 TB the shuffle is the query. This Aggregator keeps a bounded
  * buffer of k (ord, id) pairs, so partial aggregation reduces each
  * partition to ≤ k rows per key before the shuffle; what moves is
  * O(keys·k), not O(rows). Same result set, orders-of-magnitude less
  * shuffle on heavy data (the same trick TakeOrderedAndProject applies
  * globally, applied per key).
  *
  * Buffer kept sorted (desc ord, asc id); insertion cost O(k) per row is
  * the right trade for the small k this targets.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better) take k)

  /** a ranks above b: greater ord first, lower id breaks ties. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, x)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
