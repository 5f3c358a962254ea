package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation — the `Aggregator[IN, BUF, OUT]` surface (the
  * Spark-native answer to the reference's arbitrary reduce binaries when
  * the aggregation is algebraic but not built-in).
  *
  * Quantity-weighted average price in exact cents: the buffer is a pair of
  * exact integer sums, so merge order doesn't affect the result and the
  * DuckDB oracle reproduces it bit-for-bit. Spark plans this as a regular
  * two-phase aggregate (partial buffers merged after the shuffle).
  *
  * Accumulation is overflow-CHECKED (addExact/multiplyExact — JIT
  * intrinsics, no measurable cost): a Long holds Σ cents·qty up to ~9.2e18,
  * ≈10^11 rows/group at this data's magnitudes — beyond that the job must
  * FAIL loudly, not wrap negative and return a silently wrong average.
  * For groups past that scale, swap the buffer to DECIMAL(38,0) sums (the
  * same escalation [[PortableRound.asScaled]] documents).
  */
object WeightedAvgCents extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (Math.addExact(b._1, Math.multiplyExact(a._1, a._2)), Math.addExact(b._2, a._2))
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (Math.addExact(x._1, y._1), Math.addExact(x._2, y._2))
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1 / 100.0 / r._2
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
