package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CORPUS BUILD — the streaming mirror of
  * [[graft.operators.Dedup.qCorpusBuild]]'s write path, composed from
  * pieces that each already carry their own exactly-once story:
  *
  *   admission gates ([[StreamingDedup.dsirAdmit]] /
  *   [[StreamingDedup.annAgainstIndex]] / [[StreamingDedup.cdcAgainstCorpus]]
  *   — the caller chains whichever subset its pipeline needs, they are
  *   ordinary stream-to-stream transforms) → the idempotent `graft-kv`
  *   STREAMING sink (deterministic (epoch, partition) shard names, so a
  *   replayed epoch re-commits the same files) → a MANIFEST maintainer
  *   that tails the WRITTEN corpus directory as a `graft-kv` stream and
  *   folds per-source (docs kept, token mass) partials into a
  *   [[VersionedTable]] snapshot.
  *
  * Two properties carried over from the batch card:
  *
  *   - the manifest is counted from the READ-BACK shard files, never
  *     from the pre-write frame — a write bug breaks the manifest, not
  *     just the corpus;
  *   - an additive partial merge is NOT idempotent, so the manifest
  *     rides the shared versioned-snapshot commit protocol: a replayed
  *     micro-batch recomputes the same version from the same committed
  *     base (see [[VersionedTable]]).
  *
  * Scale: the corpus leg is a stateless per-batch write (cost ∝ batch);
  * the manifest leg joins the batch's read-back rows against the static
  * doc→source metadata (stream-static join — batch-sized build side,
  * the static side prunes to the joined keys) and merges into a
  * source-cardinality-sized snapshot. Neither leg ever rescans the
  * corpus. The two legs checkpoint independently and converge on the
  * same drained prefix — the e2e spec kills BOTH mid-drain and proves
  * the resumed manifest equals a batch rebuild over the written files.
  */
object CorpusBuildSink {

  /** Corpus leg: write the (post-gate) admitted document stream —
    * columns (doc_id, text) — through the idempotent `graft-kv`
    * streaming sink. */
  def corpusStream(
      admitted: DataFrame,
      out: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    admitted
      .select(col("doc_id").cast("string").as("key"), col("text").as("value"))
      .writeStream.format("graft-kv")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start(out)

  /** Manifest leg: tail the written corpus directory as a `graft-kv`
    * stream (the streaming sink's epoch-shard names are the monotone
    * naming contract the source requires) and maintain `table` as the
    * per-source manifest snapshot. `docMeta` is the static (doc_id,
    * source) metadata the read-back rows re-derive their source from —
    * same join as the batch manifest. */
  def manifestStream(
      s: SparkSession,
      corpusDir: String,
      docMeta: DataFrame,
      table: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      retain: Int = 1): StreamingQuery =
    s.readStream.format("graft-kv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(corpusDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyManifestBatch(batch.sparkSession, table, docMeta, batch, batchId, retain)
      }
      .start()

  /** Fold ONE micro-batch of read-back corpus rows into the manifest —
    * the ≤20-line [[VersionedTable]] consumer: per-source sum-mergeable
    * partials (doc count, exact token mass), merged additively into the
    * committed snapshot. Public to the spec. */
  private[streaming] def applyManifestBatch(
      s: SparkSession, table: String, docMeta: DataFrame,
      batch: DataFrame, batchId: Long, retain: Int = 1): Unit =
    VersionedTable.applyBatch(s, table, batchId, retain) { base =>
      val delta = batch
        .select(
          col("key").cast("long").as("doc_id"),
          size(graft.functions.NativeExprs.tokens(col("value")))
            .cast("long").as("n_tokens"))
        // LEFT join: a written key with no metadata is a write bug, and
        // it must SURFACE as an __unknown__ manifest row — an inner join
        // would silently shrink the manifest instead (the batch card's
        // survivors_observed cross-check has no streaming twin, so
        // visibility is the defense here)
        .join(docMeta, Seq("doc_id"), "left")
        .withColumn("source", coalesce(col("source"), lit("__unknown__")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"), sum("n_tokens").as("tokens_kept"))
      val merged = base match {
        case None => delta
        case Some(b) =>
          b.unionByName(delta).groupBy("source")
            .agg(sum("n_docs_kept").as("n_docs_kept"),
              sum("tokens_kept").as("tokens_kept"))
      }
      // eager: the merged plan reads the base version, which applyBatch
      // retires after the marker advances
      merged.localCheckpoint()
    }

  /** Committed manifest snapshot (None before the first commit). */
  def manifest(s: SparkSession, table: String): Option[DataFrame] =
    VersionedTable.current(s, table)
}
