package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming trending terms — the Misra–Gries summary as INCREMENTAL
  * STORED STATE: each micro-batch reduces to its own ≤ k-entry MG
  * summary (the [[graft.functions.MisraGriesAgg]] aggregate, so the
  * per-batch work is O(k) per partition pre-shuffle), which then merges
  * into a persisted ≤ k-row summary table with the SAME mergeability
  * operation the aggregate uses internally. Daily cost ∝ batch, state
  * bounded by k — the streaming twin of q_heavy_hitters, and the same
  * persisted-mergeable-state story as the percentile histogram and the
  * MV partials, instantiated for a sketch.
  *
  * The merge runs driver-side over two ≤ k-entry maps — a bounded pull
  * far inside the repo's ≤64k-row driver policy, and the honest
  * rendering of what this state IS: sketch summaries are small by
  * construction; shipping them through an executor shuffle would be
  * theater.
  *
  * Error discipline across batches: merging per-batch summaries keeps
  * the global MG guarantee (under-read ≤ Σnᵢ/(k+1) = n/(k+1)), so any
  * term with total frequency > n/(k+1) is still guaranteed present in
  * the stored summary no matter how the stream was sliced into batches
  * — the capacity regime (distinct ≤ k throughout) stays EXACT, which
  * is what the batch-agreement spec pins.
  *
  * Replay safety: the shared [[VersionedTable]] snapshot-commit protocol
  * — an MG merge is NOT idempotent (re-merging a batch's summary into a
  * state that already contains it would double-count and break the
  * underestimate-only invariant), so the marker-skip alone is
  * insufficient; see the module doc for the crash-window argument.
  */
object TrendingTerms {

  /** Current COMMITTED summary (term → est), empty when no batch has
    * committed — reads the snapshot version named by the marker, never
    * a live table a crashed attempt may have half-advanced. */
  private[streaming] def storedSummary(s: SparkSession, table: String): Map[String, Long] =
    VersionedTable.current(s, table)
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty)

  /** The merged ≤ k-row summary as a frame: per-batch MG summary (the
    * aggregate, O(k) per partition pre-shuffle) merged driver-side into
    * the PROTOCOL-SUPPLIED committed base with the same mergeability
    * operation — a pure function of (committed base, batch), as the
    * commit protocol requires. Taking the base as a parameter (rather
    * than re-reading the stored table) means the marker log is scanned
    * once per commit and the merge provably depends on the base
    * [[VersionedTable.applyBatch]] resolved, not on whatever catalog
    * state happens to be current. */
  private def mergedFrame(
      s: SparkSession, base: Option[DataFrame], batch: DataFrame, k: Int): DataFrame = {
    val mg = udaf(new graft.functions.MisraGriesAgg(k))
    val batchSummary = batch
      .agg(mg(col("term")).as("sk"))
      .collect().head.getAs[Map[String, Long]]("sk")
    val baseMap = base
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      .getOrElse(Map.empty[String, Long])
    val merged = MisraGries.merge(baseMap, batchSummary, k)
    val rows: java.util.List[Row] =
      java.util.List.of(merged.toSeq.sortBy(-_._2).map(t => Row(t._1, t._2)): _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "term", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "est", org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(rows, schema)
  }

  /** Step 1 of the commit protocol only — public to the spec so the
    * crash window between the version write and the marker append is
    * directly exercisable. */
  private[streaming] def writeVersion(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long, k: Int): Unit =
    VersionedTable.writeVersion(
      s, table, batchId, mergedFrame(s, VersionedTable.current(s, table), batch, k))

  /** Merge ONE micro-batch of (term) rows into the stored summary.
    * Public to the spec so replay behavior, the crash window, and the
    * merge arithmetic are testable without a crash harness. */
  private[streaming] def applyBatch(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long, k: Int,
      retain: Int = 1): Unit =
    VersionedTable.applyBatch(s, table, batchId, retain) { base =>
      mergedFrame(s, base, batch, k)
    }

  /** Start the stream: `terms` rows (one `term` column) maintain `table`
    * as the ≤ k-row global summary. `retain` is the time-travel window
    * (committed snapshots kept readable via
    * [[VersionedTable.versionAt]]; default 1 = current only). */
  def trendingStream(
      terms: DataFrame,
      table: String,
      checkpoint: String,
      k: Int,
      retain: Int = 1): StreamingQuery =
    terms.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId, k, retain)
      }
      .start()
}
