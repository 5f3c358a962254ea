package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
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
  * Replay safety: same audit-marker recipe as [[UpsertSink]] — a
  * replayed batch id is skipped; the summary overwrite is versioned by
  * the committed marker, so the crash window between the two writes
  * degrades to a re-merge of the same batch summary from the same prior
  * state (deterministic), never a double-merge.
  */
object TrendingTerms {

  private def commits(table: String) = table + "_commits"

  private def committedBatch(s: SparkSession, table: String): Long = {
    val t = commits(table)
    if (!s.catalog.tableExists(t)) -1L
    else {
      s.catalog.refreshTable(t)
      val r = s.table(t).agg(max("batch_id")).collect().head
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  /** Current stored summary (term → est), empty when absent. */
  private[streaming] def storedSummary(s: SparkSession, table: String): Map[String, Long] =
    if (!s.catalog.tableExists(table)) Map.empty
    else {
      s.catalog.refreshTable(table)
      s.table(table).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

  /** Merge ONE micro-batch of (term) rows into the stored summary.
    * Public to the spec so replay behavior and the merge arithmetic are
    * testable without a crash harness. */
  private[streaming] def applyBatch(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long, k: Int): Unit = {
    if (batchId <= committedBatch(s, table)) return // at-least-once replay
    val mg = udaf(new graft.functions.MisraGriesAgg(k))
    val batchSummary = batch
      .agg(mg(col("term")).as("sk"))
      .collect().head.getAs[Map[String, Long]]("sk")
    val merged = MisraGries.merge(storedSummary(s, table), batchSummary, k)
    val rows: java.util.List[Row] =
      java.util.List.of(merged.toSeq.sortBy(-_._2).map(t => Row(t._1, t._2)): _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "term", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "est", org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(rows, schema)
      .write.mode(SaveMode.Overwrite).saveAsTable(table)
    s.catalog.refreshTable(table)
    s.createDataFrame(
      java.util.List.of(Row(batchId)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "batch_id", org.apache.spark.sql.types.LongType))))
      .write.mode(SaveMode.Append).saveAsTable(commits(table))
  }

  /** Start the stream: `terms` rows (one `term` column) maintain `table`
    * as the ≤ k-row global summary. */
  def trendingStream(
      terms: DataFrame,
      table: String,
      checkpoint: String,
      k: Int): StreamingQuery =
    terms.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId, k)
      }
      .start()
}
