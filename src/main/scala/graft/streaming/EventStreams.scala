package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` schema.
  *
  * The reference is strictly batch (SURVEY.md §2.3 — no streaming of any
  * kind); this module is the extension surface that makes the engine's
  * event-analytics operators incremental. The same logical computations as
  * the batch twins in [[graft.operators.Relational]]:
  *
  *   - [[hourlyCounts]]   ≡ q_events_hourly, incremental with a watermark
  *   - [[sessionize]]     ≡ q_sessionize, as explicit keyed state
  *     (flatMapGroupsWithState) with processing-time-independent logic
  *
  * Scale notes: state is keyed by (window, event_type) / user_id and
  * sharded by the shuffle — 1000 executors hold disjoint state shards. The
  * watermark bounds state size: windows/sessions older than the watermark
  * are evicted. Sources/sinks are pluggable (`readStream.format(...)`);
  * tests drive a MemoryStream, production would use Kafka/files with the
  * identical transformation graph.
  */
/** Keyed session state (public top-level: Spark's product encoder codegen
  * requires an accessible constructor). Timestamps in epoch MILLIS (the
  * source precision — second-truncation would corrupt session_start);
  * value total in exact cents (the same fixed-point the batch twin sums —
  * a raw double accumulator would be merge-order-dependent). */
final case class SessionState(startMs: Long, lastMs: Long, n: Long, totalCents: Long)

/** Keyed state for [[EventStreams.userProfiles]] (top-level for the
  * product encoder, like [[SessionState]]). Exact-cents total for the
  * same merge-order-independence reason. */
final case class ProfileState(nEvents: Long, totalCents: Long, lastMs: Long)

/** The running per-user activity profile [[EventStreams.userProfiles]]
  * emits on every update — the online-feature-store row shape. */
final case class UserProfile(
    user_id: Long, n_events: Long, total_value: Double, last_ts: java.sql.Timestamp)

/** Keyed state for [[EventStreams.quotaAdmit]]: events admitted so far in
  * the key's hour (top-level for the product encoder, like
  * [[SessionState]]). */
final case class QuotaState(admitted: Long)

/** One admission decision from [[EventStreams.quotaAdmit]]: `hour` is the
  * event-time hour the quota applies to, `admitted` whether this event was
  * within the per-user budget when processed. */
final case class QuotaDecision(
    user_id: Long, hour: java.sql.Timestamp, event_id: Long, admitted: Boolean)

object EventStreams {

  /** Tumbling 1-hour windowed counts/sums per event type with a 2-hour
    * watermark for late data. Append-mode compatible: results emit once a
    * window is below the watermark. sum_value is the exact-cents sum the
    * batch twin (q_events_hourly) computes — order-independent, so the
    * incremental result is bit-identical to the batch one. */
  def hourlyCounts(events: DataFrame): DataFrame = {
    import graft.functions.PortableRound.asScaled
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(asScaled(col("value"), 2)) / lit(100.0)).as("sum_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"),
        col("n"),
        col("sum_value"))
  }

  /** Streaming sketch aggregation: approximate distinct users per hourly
    * window (HLL++ via approx_count_distinct). The sketch is the whole
    * point at scale — exact windowed distinct holds every user id seen in
    * every open window in state, while the HLL state per (window, type)
    * is a fixed few KB regardless of cardinality. Same watermark/append
    * semantics as [[hourlyCounts]]; the spec cross-checks the estimate
    * against the exact per-window distinct on the test stream. */
  def hourlyUniques(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct("user_id").as("approx_users"))
      .select(
        col("window.start").as("hour"),
        col("event_type"),
        col("approx_users"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class SessionAgg(
      user_id: Long, session_start: java.sql.Timestamp, n_events: Long, session_value: Double)

  /** Event-time sessionization with a 30-minute inactivity gap as explicit
    * keyed state. A session is emitted either when a later event from the
    * same user arrives past the gap, or — via EventTimeTimeout — when the
    * watermark passes the session's gap deadline, so a user's FINAL session
    * is flushed and their state evicted without needing another event.
    * State size is therefore bounded by the watermark: one in-flight
    * session per user active within the watermark horizon.
    * The streaming twin of q_sessionize.
    *
    * Out-of-order handling: within a micro-batch, events are sorted; an
    * in-watermark event from a LATER batch that is older than the stored
    * span merges with min/max guards — the span only widens, so a late
    * event can neither regress lastMs (which would wrongly split the
    * session and shrink the timeout deadline) nor be double-counted. The
    * one documented deviation from the batch twin: a late event older
    * than the span start by more than the gap would, in the fully-sorted
    * batch view, form its own earlier session; handling that exactly
    * needs full event buffering in state, and the watermark bounds how
    * far such an event can trail. */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermarkDelay: String = "1 hour"): Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(st: SessionState) =
            SessionAgg(
              userId, new java.sql.Timestamp(st.startMs), st.n, st.totalCents / 100.0)
          def cents(v: Double) = math.floor(v * 100 + 0.5).toLong // ≡ asScaled(v, 2)
          if (state.hasTimedOut) {
            // Watermark passed lastMs + gap with no further events: the
            // session is final — flush it and drop the state.
            val out = state.getOption.map(emit).iterator
            state.remove()
            out
          } else {
            // Within a micro-batch events may arrive unordered; session
            // logic is event-time only, so sort the batch (bounded by
            // batch size).
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st == null) {
                st = SessionState(t, t, 1, cents(e.value))
              } else if (t - st.lastMs > gapMs) {
                out += emit(st)
                st = SessionState(t, t, 1, cents(e.value))
              } else {
                st = SessionState(
                  math.min(st.startMs, t),
                  math.max(st.lastMs, t),
                  st.n + 1,
                  st.totalCents + cents(e.value))
              }
            }
            if (st != null) {
              state.update(st)
              // Flush when the watermark passes the gap deadline. The
              // timeout must sit strictly above the current watermark;
              // max() guards the edge where a just-not-late event's
              // deadline already trails it.
              state.setTimeoutTimestamp(
                math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            out.iterator
          }
      }
  }

  /** Per-user running activity profile via `transformWithState` — the
    * arbitrary-state API that supersedes flatMapGroupsWithState (typed
    * state handles, composable state variables, built-in per-key state
    * TTL instead of hand-rolled timeout bookkeeping). One ValueState per
    * user holds (n_events, exact-cents total, last-seen); every
    * micro-batch emits the updated profile row — the online feature
    * store shape. With a TTL set, state is bounded by it: a user idle
    * past the TTL is evicted by the state store itself, no timer code —
    * note TTL requires `TimeMode.ProcessingTime`, under which the query
    * SELF-TRIGGERS batches to service evictions (so `processAllAvailable`
    * never idles; drive it with a real trigger, e.g. AvailableNow).
    * `ttl = None` runs in `TimeMode.None` — data-driven batches only,
    * state bounded by user cardinality. Requires the RocksDB state store
    * provider (transformWithState's backing store; callers set
    * `spark.sql.streaming.stateStore.providerClass`). At scale, state
    * shards by user over the shuffle exactly like [[sessionize]]. */
  def userProfiles(
      events: Dataset[Event],
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofHours(24))): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    class UserProfileProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserProfile] {
      @transient private var profile: ValueState[ProfileState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        profile = getHandle.getValueState[ProfileState](
          "profile",
          org.apache.spark.sql.Encoders.product[ProfileState],
          ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
      override def handleInputRows(
          userId: Long,
          rows: Iterator[Event],
          timerValues: TimerValues): Iterator[UserProfile] = {
        def cents(v: Double) = math.floor(v * 100 + 0.5).toLong // ≡ asScaled(v, 2)
        var st = if (profile.exists()) profile.get() else ProfileState(0L, 0L, 0L)
        rows.foreach { e =>
          st = ProfileState(
            st.nEvents + 1, st.totalCents + cents(e.value), math.max(st.lastMs, e.ts.getTime))
        }
        profile.update(st)
        Iterator.single(
          UserProfile(userId, st.nEvents, st.totalCents / 100.0, new java.sql.Timestamp(st.lastMs)))
      }
    }
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, timeMode, OutputMode.Update())
  }

  /** Built-in session-window sessionization — the declarative twin of
    * [[sessionize]]: `session_window(ts, gap)` merges overlapping
    * per-event windows in the state store, evicted by the watermark, with
    * none of the custom-state code. Prefer this form unless the session
    * logic needs per-event custom state (mid-session emission, dynamic
    * gaps); both are tested to agree. Same exact-cents value sum as the
    * batch twin. */
  /** Per-user hourly quota admission — the rate-limit gate an ingestion
    * front end applies before anything expensive runs: at most `perHour`
    * events per (user, event-time hour) are admitted; every event still
    * emits a decision row so rejects are auditable downstream.
    *
    * State is ONE counter per active (user, hour) key, sharded by the
    * shuffle and evicted by EventTimeTimeout once the watermark passes
    * the hour's end — bounded by construction (users active within the
    * watermark horizon × ≤2 in-flight hours each).
    *
    * Determinism contract: events are ordered by (ts, event_id) WITHIN a
    * micro-batch; across batches admission is first-come (the stored
    * counter carries over), so a late-but-in-watermark event can be
    * rejected although the fully-sorted batch replay would have admitted
    * it — the same bounded deviation [[sessionize]] documents, and the
    * spec pins the single-batch case where stream and batch replay agree
    * exactly. The COUNT of admitted events per key is order-independent
    * (min(n, perHour)) and always matches the batch twin. */
  def quotaAdmit(
      events: Dataset[Event],
      perHour: Long,
      watermarkDelay: String = "1 hour"): Dataset[QuotaDecision] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourMs = 3600000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.ts.getTime / hourMs))
      .flatMapGroupsWithState[QuotaState, QuotaDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, Long), batch: Iterator[Event], state: GroupState[QuotaState]) =>
          val (userId, hourIdx) = key
          if (state.hasTimedOut) {
            // Watermark passed the hour: no further in-watermark event can
            // key here — drop the counter.
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var n = state.getOption.map(_.admitted).getOrElse(0L)
            val hour = new java.sql.Timestamp(hourIdx * hourMs)
            val out = sorted.map { e =>
              val ok = n < perHour
              if (ok) n += 1
              QuotaDecision(userId, hour, e.event_id, ok)
            }
            state.update(QuotaState(n))
            state.setTimeoutTimestamp(
              math.max(hourIdx * hourMs + hourMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  def sessionizeBuiltin(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import graft.functions.PortableRound.asScaled
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(asScaled(col("value"), 2)) / lit(100.0)).as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"),
        col("session_value"))
  }

  /** File-source streaming entry: watch a directory of event parquet and
    * maintain the hourly aggregate — shows the full readStream→writeStream
    * wiring with the events nanosecond-timestamp handling. */
  def hourlyFromDirectory(spark: SparkSession, dir: String): DataFrame = {
    // streams need a fixed schema up front; peek it from the files already
    // in the directory (one footer read) so the ts generation — raw nanos
    // BIGINT vs native TIMESTAMP — is whatever the data actually is. An
    // EMPTY directory (the bootstrap of a fresh ingestion pipeline, files
    // land after the query starts) can't be peeked: fall back to the
    // current testdata generation's schema (TIMESTAMP_NTZ micros).
    val schema =
      try spark.read.parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
              "event_type STRING, value DOUBLE, props STRING")
      }
    val raw = spark.readStream
      .schema(schema)
      .parquet(dir)
    hourlyCounts(graft.Tables.normalizeTs(raw)) // shared batch/stream conversion
  }

  /** Trending terms via the foreachBatch escape hatch: windowed word
    * counts aggregate incrementally, and each trigger's emission is
    * re-ranked to a per-window top-k by ordinary BATCH code inside
    * foreachBatch — the standard pattern for logic Structured
    * Streaming's incremental model can't express in-stream (global
    * ranking is not an incrementalizable aggregate; a rank emitted in
    * append mode could be invalidated by the next batch).
    *
    * COMPLETE output mode is load-bearing for rank correctness: update
    * mode hands foreachBatch only the CHANGED (window, term) rows, and a
    * rank over a partial table is not the window's true top-k. Complete
    * mode re-emits the full aggregate each trigger, so the batch-side
    * rank is globally correct — at the cost of state covering EVERY
    * window ever seen: complete mode never evicts a group, so this form
    * is for BOUNDED streams only (a backfill replay, a fixed campaign
    * horizon); nothing in the query bounds it by construction. The
    * unbounded-safe path is [[trendingTermsUpdate]] — update mode with a
    * watermark (bounded state) feeding an external upsert store ranked
    * at read time. `sink` receives (window_start, term, cnt, rk ≤ k);
    * the latest emission per window is authoritative. The ranking input
    * is the aggregated (window, term) table, never raw events. */
  def trendingTerms(
      docs: DataFrame,
      k: Int,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val counts = docs
      .select(col("ts"), explode(graft.functions.NativeExprs.tokens(col("text"))).as("term"))
      .groupBy(window(col("ts"), "1 hour"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("term"), col("cnt"))
    counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("window_start")
          .orderBy(col("cnt").desc, col("term"))
        sink(batch.withColumn("rk", row_number().over(w)).filter(col("rk") <= k))
      }
      .start()
  }

  /** The unbounded-stream form of [[trendingTerms]]: UPDATE output mode
    * with a watermark, so Spark's aggregation state is bounded BY
    * CONSTRUCTION — a window's groups are evicted once the watermark
    * passes its end plus the delay. Each trigger emits only the CHANGED
    * (window_start, term, cnt) rows; `upsert` merges them into an
    * external keyed store (the standard serving pattern — Redis/RocksDB
    * in production, a map in tests), which ranks per window at READ
    * time. Ranking cannot live in-stream here precisely because updates
    * are partial — that is the complete-mode trade this variant
    * reverses: bounded state + late-data cutoff, rank computed where the
    * full per-window table lives. */
  def trendingTermsUpdate(
      docs: DataFrame,
      watermarkDelay: String,
      upsert: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val counts = docs
      .select(col("ts"), explode(graft.functions.NativeExprs.tokens(col("text"))).as("term"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("term"), col("cnt"))
    counts.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) => upsert(batch) }
      .start()
  }

  /** Streaming exact dedup: one document per content fingerprint — the
    * incremental twin of Dedup.qExact/qDedupApply's exact stage. A
    * fingerprint seen in an earlier micro-batch is always dropped; within
    * a single micro-batch an arbitrary representative wins (Spark's
    * dropDuplicates contract). Expects (doc_id, ts, text).
    *
    * CAUTION — state is UNBOUNDED here: dropDuplicates evicts by watermark
    * only when the event-time column is part of the dedup key, and the key
    * here is the fingerprint alone, so every fingerprint ever seen stays
    * in the state store. Correct for exact global dedup, but at 100 TB use
    * [[dedupStreamBounded]] unless the corpus's fingerprint cardinality
    * genuinely fits in cluster state. */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.Dedup.fingerprint(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("fingerprint")
      .select("doc_id", "ts", "fingerprint")

  /** Bounded-state streaming dedup: dropDuplicatesWithinWatermark evicts a
    * fingerprint's state once the watermark passes its event time plus the
    * delay, so state holds only the fingerprints of the last watermark
    * window — the 100 TB-safe trade: duplicates are guaranteed dropped
    * only within the watermark horizon (a re-post months later is treated
    * as new), which is the semantics near-dup pipelines actually want for
    * rolling ingestion. */
  def dedupStreamBounded(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.Dedup.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select("doc_id", "ts", "fingerprint")

  /** Watermarked stream-stream interval join: attribute each purchase to
    * the same user's views in the preceding hour. Both sides carry
    * watermarks and the join condition bounds p_ts to [v_ts, v_ts+1h], so
    * Spark derives state-eviction watermarks for BOTH join state stores —
    * without the time bound, stream-stream join state grows forever. The
    * join shuffles both streams on user_id; state is sharded with them. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame): DataFrame =
    viewPurchaseJoinWith(views, purchases, "inner")

  /** Left-outer twin of [[viewPurchaseJoin]]: every view appears, with
    * null purchase columns when no purchase followed within the hour —
    * the "abandoned view" attribution stream. Outer stream-stream joins
    * make the watermark + time bound mandatory rather than just
    * state-hygiene: a view can only be emitted as UNMATCHED once the
    * purchase-side watermark has passed v_ts + 1h (before that a match
    * could still arrive), so null rows trail the watermark by design and
    * every emission is final — no retraction, state evicted as in the
    * inner form. */
  def viewPurchaseJoinOuter(views: DataFrame, purchases: DataFrame): DataFrame =
    viewPurchaseJoinWith(views, purchases, "left_outer")

  /** Stream-static AS-OF enrichment: each event joins the dimension
    * VERSION whose [valid_from, valid_to) interval covers its event time
    * — the streaming consumption side of an SCD-2 history table (the
    * [[graft.operators.Maintenance.qScd2History]] shape on a time axis).
    * `dim` carries (user_id, valid_from, valid_to, ...attrs) with
    * intervals partitioning each key's timeline, so the match is unique
    * by construction and no event is double-enriched.
    *
    * Plan shape: stream-static joins are STATELESS — the static side is
    * re-planned every micro-batch (broadcast when it fits), nothing
    * enters a state store, and no watermark is needed for correctness.
    * The equi-join runs on user_id with the interval check as a post-join
    * filter, so the static side shuffles (or broadcasts) by key, never by
    * interval. Inner semantics: an event before its key's first version
    * (or for an unknown key) is dropped — the auditable-reject variant is
    * a left join over the same condition. */
  def enrichAsOf(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(dim, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") && col("ts") < col("valid_to"))

  private def viewPurchaseJoinWith(
      views: DataFrame,
      purchases: DataFrame,
      joinType: String): DataFrame = {
    val v = views
      .select(
        col("user_id").as("v_user"),
        col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases
      .select(
        col("user_id").as("p_user"),
        col("ts").as("p_ts"),
        col("event_id").as("purchase_id"),
        col("value"))
      .withWatermark("p_ts", "2 hours")
    v.join(
        p,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      .select(
        col("v_user").as("user_id"),
        col("view_id"),
        col("purchase_id"),
        col("v_ts"),
        col("p_ts"),
        col("value"))
  }
}
