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
  * Buffer kept sorted (desc ord, asc id); insertion is a single O(k)
  * splice at the insertion point (no re-sort of the already-sorted
  * buffer). Ordering uses java.lang.Double.compare — a TOTAL order in
  * which NaN ranks above every finite value, matching Spark's window-sort
  * NaN placement under DESC; a naive `>` comparator is not a strict weak
  * order under NaN and makes the surviving rows partitioning-dependent.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length == k && better(buf.last, x)) buf
    else {
      val (above, below) = buf.span(better(_, x))
      (above ++ (x +: below)).take(k)
    }

  /** a ranks above b: greater ord first (total order, NaN greatest),
    * lower id breaks ties. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

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
