package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming AGGREGATE-view maintenance — the stream half of
  * [[graft.operators.Maintenance.qMvIncremental]]: each micro-batch of
  * enriched fact rows folds into a persisted revenue-MV partials table,
  * so the dashboard view stays current without ever rescanning history.
  *
  * Exactly-once EFFECT needs more care than the SCD-1 upsert sink: an
  * ADDITIVE merge is not idempotent (re-applying a replayed batch would
  * double-count), so the marker-skip alone leaves the crash window
  * between table write and marker write double-applying. This sink
  * closes that window with VERSIONED SNAPSHOTS — the mechanism Delta /
  * Iceberg provide natively, re-derived on plain parquet:
  *
  *   - batch `b` writes table version `v<b>` computed from the COMMITTED
  *     version + batch partials (never in place);
  *   - the marker advances to `b` only after `v<b>` is written;
  *   - a replay of batch `b` recomputes `v<b>` from the same committed
  *     base and the same batch rows — an idempotent overwrite of
  *     identical content, whether or not the marker had advanced.
  *
  * State design: only UNCONDITIONALLY sum-mergeable states ride the
  * stream (row count, integral revenue cents) — a distinct-count state
  * like the batch card's n_orders needs order-atomic delivery, which a
  * micro-batch boundary does NOT guarantee (the spec proves an order
  * split across two batches still lands exactly). Merge cost per batch:
  * batch partials + one key-cardinality-sized stored table — never the
  * corpus.
  */
object MvMaintainSink {

  private def markerTable(table: String) = table + "_commits"
  private def versionName(table: String, v: Long) = table + "_v" + v

  /** Highest committed snapshot's batch id (-1 when none). */
  private[streaming] def committedBatch(s: SparkSession, table: String): Long = {
    val t = markerTable(table)
    if (!s.catalog.tableExists(t)) -1L
    else {
      s.catalog.refreshTable(t)
      val r = s.table(t).agg(max("batch_id")).collect().head
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  /** The current committed MV state (empty-schema frame when none). */
  private[streaming] def current(s: SparkSession, table: String): Option[DataFrame] = {
    val c = committedBatch(s, table)
    if (c < 0L) None else Some(s.table(versionName(table, c)))
  }

  /** Per-(nation, year) sum-mergeable partials of a fact micro-batch
    * with schema (n_name, o_year, l_extendedprice, l_discount). */
  private def partials(batch: DataFrame): DataFrame = {
    import graft.functions.PortableRound.asScaled
    batch
      .groupBy("n_name", "o_year")
      .agg(
        count(lit(1)).as("n_items"),
        sum((asScaled(col("l_extendedprice"), 2) *
          (lit(100L) - asScaled(col("l_discount"), 2))).cast("decimal(38,0)"))
          .as("rev_c4"))
  }

  /** Apply ONE micro-batch as a versioned snapshot commit. Public to the
    * spec so replay and crash-window behavior are directly testable. */
  private[streaming] def applyBatch(
      s: SparkSession, table: String, batch: DataFrame, batchId: Long): Unit = {
    val committed = committedBatch(s, table)
    if (batchId <= committed) return // replayed, already-committed batch
    val delta = partials(batch)
    val merged = current(s, table) match {
      case None => delta
      case Some(base) =>
        base.unionByName(delta)
          .groupBy("n_name", "o_year")
          .agg(sum("n_items").as("n_items"), sum("rev_c4").as("rev_c4"))
    }
    val vName = versionName(table, batchId)
    // a crashed earlier attempt may have left this version (no marker):
    // drop and rewrite — same base + same batch = identical content
    s.sql(s"DROP TABLE IF EXISTS $vName")
    graft.sources.Warehouse.ensureVia(s, vName) {
      merged.localCheckpoint().write.mode(SaveMode.Overwrite).saveAsTable(vName)
    }
    val commit = s.createDataFrame(
      java.util.List.of(Row(batchId)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "batch_id", org.apache.spark.sql.types.LongType))))
    commit.write.mode(SaveMode.Append).saveAsTable(markerTable(table))
    // retire the superseded snapshot (production keeps a retention
    // window for time travel; the mechanics are the same DROP)
    if (committed >= 0L) s.sql(s"DROP TABLE IF EXISTS ${versionName(table, committed)}")
  }

  /** Start the maintenance stream over enriched fact rows
    * (n_name, o_year, l_extendedprice, l_discount). */
  def maintainStream(
      facts: DataFrame,
      table: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId)
      }
      .start()
}
