package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift monitor — the admission-side twin of the
  * batch drift cards ([[graft.operators.Evaluation]]'s q_tv_drift):
  * every micro-batch's categorical mix is compared against a stored
  * REFERENCE histogram by exact integer total-variation distance, and an
  * (batch_id, n_batch, tvd_ppm, alarm) row is appended to an audit
  * table. A pipeline gates ingestion on `alarm` — the "yesterday's crawl
  * suddenly looks different" tripwire that runs BEFORE the batch is
  * admitted into the corpus, where the batch dedup/quality cards would
  * only see the damage after the fact.
  *
  * TVD is the drift statistic for the same reason as the batch card: it
  * is an exact rational in the counts (10⁶·Σ|c_b·n_ref − c_ref·n_b| div
  * (2·n_b·n_ref)) — no logarithm, so the alarm decision is deterministic
  * and replayable, never an artifact of float summation order.
  *
  * Replay safety (foreachBatch is at-least-once): a replayed batch id
  * that already has an audit row is skipped — same marker recipe as
  * [[UpsertSink]], keyed directly on the audit table since the audit row
  * IS the batch's only effect.
  *
  * Scale shape: per batch, one combiner-backed histogram over the batch
  * (bounded by the category domain), a broadcast join against the
  * reference histogram (also domain-bounded), and a 1-row append. The
  * reference histogram is MATERIALIZED once at stream start
  * ([[monitorStream]] collects the domain-bounded (bin, c) rows and pins
  * them into a literal frame before wiring the foreachBatch closure) —
  * a lazy DataFrame would re-evaluate against the live table on every
  * micro-batch, so a mid-stream refresh of the reference would make the
  * monitor compare each batch against a moving reference.
  */
object DriftMonitor {

  /** Exact integer TVD (ppm) between two (bin, c) histograms — full
    * outer on the bin domain so mass on a bin the other side lacks
    * counts fully. Returns (n_a, n_b, tvd_ppm) — one row; null-guarded
    * to 0/0/null when either side is empty. */
  private[streaming] def tvdPpmOf(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.groupBy("bin").agg(sum("c").as("c_a"))
    val bb = b.groupBy("bin").agg(sum("c").as("c_b"))
    val joined = aa.join(bb, Seq("bin"), "full_outer")
      .select(
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val tot = joined.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    joined
      .crossJoin(broadcast(tot))
      .groupBy("n_a", "n_b")
      .agg(sum(abs(
        col("c_a").cast("decimal(38,0)") * col("n_b") -
          col("c_b").cast("decimal(38,0)") * col("n_a"))).as("sg"))
      .select(
        col("n_a"), col("n_b"),
        expr("cast(sg * 1000000 div (2 * cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("tvd_ppm"))
  }

  /** Has `batchId` already been audited into `table`? */
  private def audited(s: SparkSession, table: String, batchId: Long): Boolean =
    s.catalog.tableExists(table) && {
      s.catalog.refreshTable(table)
      !s.table(table).filter(col("batch_id") === batchId).isEmpty
    }

  /** Audit ONE micro-batch of (bin) rows against the reference histogram
    * (bin, c). Public to the spec so replay behavior and the alarm
    * arithmetic are testable without a crash harness. An EMPTY batch
    * appends a quiet row (n_batch = 0, tvd null, alarm 0) — silence and
    * "nothing arrived" must stay distinguishable in the audit trail. */
  private[streaming] def applyBatch(
      s: SparkSession,
      refHist: DataFrame,
      table: String,
      batch: DataFrame,
      batchId: Long,
      thresholdPpm: Long): Unit = {
    if (audited(s, table, batchId)) return // at-least-once replay: already audited
    val bh = batch.groupBy("bin").agg(count(lit(1)).as("c"))
    val row =
      if (batch.isEmpty)
        s.createDataFrame(
          java.util.List.of(Row(batchId, 0L, null, 0L)),
          auditSchema)
      else
        tvdPpmOf(bh, refHist)
          .select(
            lit(batchId).as("batch_id"),
            col("n_a").as("n_batch"),
            col("tvd_ppm"),
            when(col("tvd_ppm") > thresholdPpm, 1L).otherwise(0L).as("alarm"))
    row.write.mode(SaveMode.Append).saveAsTable(table)
  }

  private val auditSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "batch_id", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField(
      "n_batch", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField(
      "tvd_ppm", org.apache.spark.sql.types.LongType, nullable = true),
    org.apache.spark.sql.types.StructField(
      "alarm", org.apache.spark.sql.types.LongType, nullable = false)))

  /** Start the monitor: `stream` rows must carry a `bin` column (the
    * categorical under watch); `refHist` is the stored (bin, c)
    * reference distribution. */
  def monitorStream(
      stream: DataFrame,
      refHist: DataFrame,
      table: String,
      checkpoint: String,
      thresholdPpm: Long): StreamingQuery = {
    // pin the reference ONCE: refHist is domain-bounded (one row per
    // category bin), so a driver-side collect is a bounded pull; every
    // micro-batch then compares against this frozen copy even if the
    // underlying reference table is refreshed mid-stream
    val pinnedRows: java.util.List[Row] =
      java.util.List.of(refHist.select(col("bin"), col("c")).collect(): _*)
    val pinnedSchema = refHist.select(col("bin"), col("c")).schema
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pinned = batch.sparkSession.createDataFrame(pinnedRows, pinnedSchema)
        applyBatch(batch.sparkSession, pinned, table, batch, batchId, thresholdPpm)
      }
      .start()
  }
}
