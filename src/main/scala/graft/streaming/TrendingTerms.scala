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
  * Replay safety: the same VERSIONED-SNAPSHOT recipe as
  * [[MvMaintainSink]] — an MG merge is NOT idempotent (re-merging a
  * batch's summary into a state that already contains it would
  * double-count and break the underestimate-only invariant), so the
  * marker-skip alone is insufficient: batch `b` writes its merged
  * summary to `<table>_v<b>` computed from the COMMITTED version, the
  * marker advances only after the version is written, and reads resolve
  * the version named by the marker. A crash between the two writes
  * followed by an at-least-once replay of batch `b` therefore
  * recomputes `v<b>` from the same committed base — an idempotent
  * overwrite of identical content, never a double-merge.
  */
object TrendingTerms {

  private def commits(table: String) = table + "_commits"
  private def versionName(table: String, v: Long) = table + "_v" + v

  private def committedBatch(s: SparkSession, table: String): Long = {
    val t = commits(table)
    if (!s.catalog.tableExists(t)) -1L
    else {
      s.catalog.refreshTable(t)
      val r = s.table(t).agg(max("batch_id")).collect().head
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  /** Current COMMITTED summary (term → est), empty when no batch has
    * committed — reads the snapshot version named by the marker, never
    * a live table a crashed attempt may have half-advanced. */
  private[streaming] def storedSummary(s: SparkSession, table: String): Map[String, Long] = {
    val c = committedBatch(s, table)
    if (c < 0L) Map.empty
    else {
      val v = versionName(table, c)
      s.catalog.refreshTable(v)
      s.table(v).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
  }

  /** Step 1 of the commit protocol: compute the merged summary from the
    * COMMITTED base and write it as version `v<batchId>` — no marker, no
    * retire. Public to the spec so the crash window between the version
    * write and the marker append is directly exercisable. */
  private[streaming] def writeVersion(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long, k: Int): Unit = {
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
    val vName = versionName(table, batchId)
    // a crashed earlier attempt may have left this version (no marker):
    // same committed base + same batch rows = identical content, so a
    // plain overwrite is the idempotent thing
    s.sql(s"DROP TABLE IF EXISTS $vName")
    graft.sources.Warehouse.ensureVia(s, vName) {
      s.createDataFrame(rows, schema)
        .write.mode(SaveMode.Overwrite).saveAsTable(vName)
    }
  }

  /** Merge ONE micro-batch of (term) rows into the stored summary.
    * Public to the spec so replay behavior, the crash window, and the
    * merge arithmetic are testable without a crash harness. */
  private[streaming] def applyBatch(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long, k: Int): Unit = {
    val committed = committedBatch(s, table)
    if (batchId <= committed) return // at-least-once replay, already committed
    writeVersion(s, table, batch, batchId, k)
    s.createDataFrame(
      java.util.List.of(Row(batchId)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "batch_id", org.apache.spark.sql.types.LongType))))
      .write.mode(SaveMode.Append).saveAsTable(commits(table))
    // retire the superseded snapshot (retention window in production)
    if (committed >= 0L) s.sql(s"DROP TABLE IF EXISTS ${versionName(table, committed)}")
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
