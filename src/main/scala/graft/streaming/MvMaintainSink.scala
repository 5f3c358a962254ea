package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * closes that window with the shared [[VersionedTable]] snapshot-commit
  * protocol (see the module doc for the crash-window argument).
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

  /** Highest committed snapshot's batch id (-1 when none). */
  private[streaming] def committedBatch(s: SparkSession, table: String): Long =
    VersionedTable.committedBatch(s, table)

  /** The current committed MV state (None when no batch committed). */
  private[streaming] def current(s: SparkSession, table: String): Option[DataFrame] =
    VersionedTable.current(s, table)

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
      s: SparkSession, table: String, batch: DataFrame, batchId: Long,
      retain: Int = 1): Unit =
    VersionedTable.applyBatch(s, table, batchId, retain) { base =>
      val delta = partials(batch)
      val merged = base match {
        case None => delta
        case Some(b) =>
          b.unionByName(delta)
            .groupBy("n_name", "o_year")
            .agg(sum("n_items").as("n_items"), sum("rev_c4").as("rev_c4"))
      }
      // eager materialization: the merged plan reads the base version,
      // which applyBatch retires after the marker advances
      merged.localCheckpoint()
    }

  /** Start the maintenance stream over enriched fact rows
    * (n_name, o_year, l_extendedprice, l_discount). `retain` is the
    * time-travel window: how many committed snapshots stay readable via
    * [[VersionedTable.versionAt]] (default 1 = current only). */
  def maintainStream(
      facts: DataFrame,
      table: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      retain: Int = 1): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, table, batch, batchId, retain)
      }
      .start()
}
