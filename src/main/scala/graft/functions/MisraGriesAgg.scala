package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a mergeable typed Aggregator —
  * the frequent-items sketch a 100 TB pipeline runs instead of a full
  * groupBy when only the heavy tail matters: each partition reduces to a
  * ≤ k-entry counter map BEFORE the shuffle, so what moves is O(k) per
  * partition regardless of row count, and the driver merge is O(k·parts).
  *
  * Invariants (the planted over-capacity spec exercises all three, and
  * the q_heavy_hitters gate pins the ≤ k-cardinality regime where the
  * summary must be EXACT):
  *
  *   - underestimate only: est(x) ≤ f(x) for every retained x;
  *   - bounded under-read: f(x) − est(x) ≤ n/(k+1) over any merge tree
  *     (each decrement event at a reduce step removes k+1 units of total
  *     mass; the merge offset m is the (k+1)-th largest combined counter,
  *     and subtracting it removes ≥ (k+1)·m units — the Agarwal et al.
  *     mergeability argument, so errors ADD to ≤ n/(k+1) total);
  *   - guaranteed retention: any x with f(x) > n/(k+1) survives (its
  *     counter cannot reach zero under the total-decrement budget).
  *
  * Determinism: the retained SET and the estimates can vary with the
  * merge tree once cardinality exceeds k (inherent to the sketch — the
  * bounds above are what is portable); at cardinality ≤ k no decrement
  * ever fires and the summary is exactly the frequency map, independent
  * of partitioning. reduce is O(1) amortized (a decrement event pays
  * O(k) but consumes k+1 prior insertions); merge is O(k log k).
  */
/** The MG kernel, exposed for reuse outside the Aggregator (the
  * streaming trending-terms state keeps a stored summary and merges each
  * micro-batch's summary into it with exactly this operation). */
object MisraGries {
  def reduceOne(buf: Map[String, Long], x: String, k: Int): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None =>
        // full and x absent: decrement every counter (x's implicit +1
        // cancels against one unit), dropping zeros — classic MG step
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter from all; strictly larger
      // counters (≤ k of them) survive
      val off = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.flatMap { case (t, c) => if (c > off) Some(t -> (c - off)) else None }
    }
  }
}

class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"counter budget k=$k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    MisraGries.reduceOne(buf, x, k)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MisraGries.merge(a, b, k)

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
