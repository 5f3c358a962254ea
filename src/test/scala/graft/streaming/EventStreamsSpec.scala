package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming operators with a MemoryStream and checks the
  * incremental results against the batch semantics (same numbers as the
  * q_events_hourly / q_sessionize batch twins would produce). */
class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60_000L)

  test("hourlyCounts aggregates tumbling windows incrementally") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = hourlyCounts(df).writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      source.addData(
        (1L, ts(5), 1L, "click", 1.0),
        (2L, ts(10), 1L, "click", 2.0),
        (3L, ts(65), 2L, "view", 5.0))
      query.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set((0L, "click", 2L, 3.0), (60L, "view", 1L, 5.0)))
    } finally query.stop()
  }

  test("hourlyUniques HLL sketch matches exact distinct users on the test stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = hourlyUniques(df).writeStream
      .format("memory")
      .queryName("uniques_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // 3 distinct users (one repeated) in hour 0, 1 in hour 1; HLL++ at
      // default rsd is exact at this cardinality, so equality, not a band
      source.addData(
        (1L, ts(5), 1L, "click", 0.0),
        (2L, ts(10), 2L, "click", 0.0),
        (3L, ts(15), 1L, "click", 0.0),
        (4L, ts(20), 3L, "click", 0.0),
        (5L, ts(65), 7L, "click", 0.0))
      query.processAllAvailable()
      val rows = spark.table("uniques_test").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows === Set((0L, "click", 3L), (60L, "click", 1L)))
    } finally query.stop()
  }

  test("foreachBatch trending terms ranks each window's words across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    // collect batches separately; the contract is that the LATEST
    // emission replaces each window's whole top-k (latest-per-(window,
    // term) would wrongly keep a term that dropped out of the top-k)
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Int)]]
    val query = EventStreams.trendingTerms(docs, k = 2, batch =>
      batches.synchronized {
        batches += batch.collect().toSeq.map(r =>
          (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getInt(3)))
      })
    try {
      source.addData((1L, ts(5), "alpha alpha beta gamma"), (2L, ts(10), "alpha gamma"))
      query.processAllAvailable()
      // second batch reshuffles hour 0: beta overtakes alpha, gamma
      // (rank 2 in batch 1) drops out of the top-2 entirely
      source.addData((3L, ts(20), "beta beta beta beta"))
      query.processAllAvailable()
      val perWindowLatest = batches.synchronized {
        val all = batches.toSeq
        all.flatMap(_.map(_._1)).distinct.map { wdw =>
          wdw -> all.filter(_.exists(_._1 == wdw)).last.filter(_._1 == wdw)
        }.toMap
      }
      val hour0 = perWindowLatest(0L).map(e => (e._2, e._3, e._4)).toSet
      // final counts in hour 0: alpha=3, beta=5, gamma=2 → top-2 = beta(1), alpha(2);
      // gamma must NOT survive from batch 1
      assert(hour0 === Set(("beta", 5L, 1), ("alpha", 3L, 2)),
        s"unexpected final top-2 for hour 0: $hour0 (batches: $batches)")
    } finally query.stop()
  }

  test("update-mode trending terms: external store ranks correctly from partial updates") {
    // the unbounded-stream variant: watermarked update mode emits only
    // CHANGED (window, term) rows; an external keyed store merges them and
    // ranks at read time — the final ranking must equal the complete-mode
    // (full recompute) answer even though no single emission held the
    // whole table
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    val store = scala.collection.mutable.Map.empty[(Long, String), Long]
    val query = EventStreams.trendingTermsUpdate(docs, "2 hours", batch =>
      store.synchronized {
        batch.collect().foreach { r =>
          store((r.getTimestamp(0).getTime / 60000, r.getString(1))) = r.getLong(2)
        }
      })
    try {
      source.addData((1L, ts(5), "alpha alpha beta gamma"), (2L, ts(10), "alpha gamma"))
      query.processAllAvailable()
      source.addData((3L, ts(20), "beta beta beta beta"))
      query.processAllAvailable()
      val hour0 = store.synchronized {
        store.toSeq.collect { case ((0L, term), cnt) => (term, cnt) }
      }
      // read-time rank over the merged store: beta=5, alpha=3, gamma=2
      val top2 = hour0.sortBy { case (term, cnt) => (-cnt, term) }.take(2)
      assert(top2 === Seq(("beta", 5L), ("alpha", 3L)), s"store ranked wrong: $hour0")
    } finally query.stop()
  }

  test("file-source stream over the real events parquet equals the batch aggregate") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val query = EventStreams.hourlyFromDirectory(spark, dir.toString)
      .writeStream
      .format("memory")
      .queryName("hourly_file_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      query.processAllAvailable()
      // compare the SUMS too: both sides aggregate in exact cents, so the
      // incremental result must be bit-identical to the batch one
      val streamed = spark.table("hourly_file_test")
        .select(
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.operators.Relational.qEventsHourly(spark, sfDir)
        .select("hour", "event_type", "n", "sum_value")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("AvailableNow catch-up: backlog to completion, then incremental resume from the checkpoint") {
    // the restart shape a real ingestion pipeline runs: process the whole
    // backlog with Trigger.AvailableNow (the query TERMINATES when caught
    // up), verify equality with the batch aggregate, then land new files
    // and resume from the SAME checkpoint — only the new data is
    // processed, and its windows match the batch aggregate of the new
    // slice alone.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-catchup-src-")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-catchup-ckpt-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events1.parquet"))
    // foreachBatch sink (memory sink refuses checkpoint recovery): merge
    // update-mode emissions per run, keyed by (hour, type) — the latest
    // emission per key is authoritative
    def runToCompletion(): Set[(String, String, Long, Double)] = {
      val acc = scala.collection.mutable.Map.empty[(String, String), (Long, Double)]
      val q = EventStreams.hourlyFromDirectory(spark, dir.toString)
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = batch
            .select(
              date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
              col("event_type"), col("n"), col("sum_value"))
            .collect()
          acc.synchronized {
            rows.foreach(r =>
              acc((r.getString(0), r.getString(1))) = (r.getLong(2), r.getDouble(3)))
          }
        }
        .start()
      assert(q.awaitTermination(180000), "AvailableNow query did not self-terminate")
      acc.synchronized {
        acc.toSeq.map { case ((h, t), (n, v)) => (h, t, n, v) }.toSet
      }
    }
    val backlog = runToCompletion()
    val batch = graft.operators.Relational.qEventsHourly(spark, sfDir)
      .select("hour", "event_type", "n", "sum_value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(backlog === batch, "backlog catch-up diverged from the batch aggregate")
    // new arrivals: the same events shifted +30 days (in the file's own ts
    // representation, so the appended file matches the stream's schema),
    // strictly later than the checkpointed watermark so nothing is "late"
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val shifted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", col("ts") + lit(30L * 86400L * 1000000000L))
      case _ =>
        raw.withColumn("ts", col("ts") + expr("INTERVAL 30 DAY"))
    }
    shifted.coalesce(1).write.mode("append").parquet(dir.toString)
    // the resumed query's emissions are ONLY the new windows (update mode:
    // backlog windows received no new rows) — equal to the batch aggregate
    // of the shifted slice computed independently
    val resumed = runToCompletion()
    val expectShifted = {
      import graft.functions.PortableRound.asScaled
      graft.Tables.normalizeTs(shifted)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), (sum(asScaled(col("value"), 2)) / lit(100.0)).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    }
    assert(resumed.nonEmpty, "resume processed nothing")
    assert(resumed === expectShifted, "incremental resume diverged from the new-slice batch aggregate")
  }

  test("streaming dedup keeps only the first document per fingerprint") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, String)]
    val df = source.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.dedupStream(df).writeStream
      .format("memory")
      .queryName("dedup_stream_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // timestamps well above epoch 0 — rows AT the initial watermark are
      // treated as late and silently dropped
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      source.addData((1L, t2(0), "hello  world"))
      query.processAllAvailable()
      source.addData(
        (2L, t2(1), "hello world"), // same after ws-normalization → dropped
        (3L, t2(2), "different doc"))
      query.processAllAvailable()
      val kept = spark.table("dedup_stream_test").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L))
    } finally query.stop()
  }

  test("bounded dedup drops dups within the watermark and re-admits after eviction") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, String)]
    val df = source.toDF().toDF("doc_id", "ts", "text")
    val query = EventStreams.dedupStreamBounded(df).writeStream
      .format("memory")
      .queryName("dedup_bounded_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      source.addData(
        (1L, t2(0), "hello  world"),
        (2L, t2(1), "hello world")) // same fingerprint, inside watermark → dropped
      query.processAllAvailable()
      source.addData((3L, t2(600), "filler")) // watermark → +540 min, evicts doc 1's state
      query.processAllAvailable()
      source.addData((4L, t2(601), "hello world")) // same fingerprint, state gone → re-admitted
      query.processAllAvailable()
      val kept = spark.table("dedup_bounded_test").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L, 4L),
        s"expected within-watermark dup dropped and post-eviction doc re-admitted; got $kept")
    } finally query.stop()
  }

  test("stream-stream interval join attributes purchases to preceding views, state bounded") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val joined = EventStreams.viewPurchaseJoin(
      views.toDF().toDF(cols: _*),
      purchases.toDF().toDF(cols: _*))
    val query = joined.writeStream
      .format("memory")
      .queryName("vp_join_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      views.addData(
        (1L, t2(0), 1L, "view", 0.0),
        (2L, t2(5), 2L, "view", 0.0))
      purchases.addData(
        (10L, t2(30), 1L, "purchase", 9.99), // within 1h of user 1's view → joins
        (11L, t2(90), 2L, "purchase", 5.0)) //  85 min after user 2's view → outside bound
      query.processAllAvailable()
      val rows = spark.table("vp_join_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSet
      assert(rows === Set((1L, 1L, 10L, 9.99)), s"unexpected join rows: $rows")
    } finally query.stop()
  }

  test("left-outer stream-stream join emits unmatched views as null once the watermark passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val joined = EventStreams.viewPurchaseJoinOuter(
      views.toDF().toDF(cols: _*),
      purchases.toDF().toDF(cols: _*))
    val query = joined.writeStream
      .format("memory")
      .queryName("vp_outer_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      views.addData(
        (1L, t2(0), 1L, "view", 0.0), //  user 1: purchase follows → matched
        (2L, t2(5), 2L, "view", 0.0)) // user 2: no purchase in window → null row
      purchases.addData((10L, t2(30), 1L, "purchase", 9.99))
      query.processAllAvailable()
      // The unmatched view can't be final yet: a purchase for user 2 could
      // still arrive. Only matched rows are in the sink at this point.
      val early = spark.table("vp_outer_test").collect()
        .filter(_.isNullAt(2)).map(_.getLong(1)).toSet
      assert(early === Set.empty[Long], s"null rows emitted before watermark: $early")
      // Advance both watermarks far past v_ts + 1h → view 2 is provably
      // unmatched and must emit with null purchase columns.
      views.addData((3L, t2(600), 3L, "view", 0.0))
      purchases.addData((11L, t2(600), 3L, "purchase", 1.0))
      query.processAllAvailable()
      val rows = spark.table("vp_outer_test").collect()
      val matched = rows.filter(!_.isNullAt(2)).map(r => (r.getLong(1), r.getLong(2))).toSet
      val unmatchedViews = rows.filter(_.isNullAt(2)).map(_.getLong(1)).toSet
      assert(matched.contains((1L, 10L)), s"matched pair missing: $matched")
      assert(unmatchedViews === Set(2L),
        s"expected exactly view 2 as the unmatched null row; got $unmatchedViews")
    } finally query.stop()
  }

  test("checkpointed dedup recovers state across a restart, sink stays exactly-once") {
    // The reference's whole fault-tolerance story is "re-execution must not
    // duplicate output" (first-writer-wins commit). The streaming
    // equivalent: stop a checkpointed query, restart it on new data, and
    // require (a) dedup state SURVIVES the restart (a dup of a pre-restart
    // doc is still dropped) and (b) pre-restart output is not re-emitted.
    import org.apache.spark.sql.types._
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft-ckpt-src-").toString
    val sinkDir = Files.createTempDirectory("graft-ckpt-sink-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-state-").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))
    def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    def writeDocs(rows: (Long, Timestamp, String)*): Unit = {
      import spark.implicits._
      rows.toSeq.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = EventStreams.dedupStream(stream).writeStream
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    writeDocs((1L, t2(0), "hello  world"), (2L, t2(1), "hello world"))
    runOnce() // doc 2 is an in-flight dup of doc 1 → only doc 1 lands
    writeDocs(
      (3L, t2(2), "hello   world"), // dup of PRE-RESTART doc 1 → recovered state must drop it
      (4L, t2(3), "brand new doc"))
    runOnce()
    val kept = spark.read.parquet(sinkDir).collect().map(_.getLong(0)).toSeq.sorted
    assert(kept === Seq(1L, 4L),
      s"state recovery or sink exactly-once broken: got $kept")
  }

  test("transformWithState user profiles accumulate across micro-batches") {
    // the arbitrary-state-v2 path: a ValueState per user (with TTL config)
    // must carry the running profile across batches — batch 2's emission
    // reflects batch 1's events, and the latest row per user equals the
    // batch-computed totals
    val s2 = spark.newSession()
    s2.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sql = s2.sqlContext
    import s2.implicits._
    val source = MemoryStream[Event]
    // ttl=None → TimeMode.None: batches fire on data only, so
    // processAllAvailable idles between batches (with a TTL the query
    // self-triggers to service evictions — covered by the next test)
    val query = EventStreams.userProfiles(source.toDS(), ttl = None).writeStream
      .format("memory")
      .queryName("profile_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      source.addData(Event(1L, ts(5), 10L, 1.50), Event(2L, ts(6), 10L, 2.25), Event(3L, ts(7), 20L, 4.00))
      query.processAllAvailable()
      source.addData(Event(4L, ts(30), 10L, 0.25))
      query.processAllAvailable()
      val latest = s2.table("profile_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getTimestamp(3).getTime / 60000))
        .groupBy(_._1)
        .map { case (u, rows) => u -> rows.maxBy(_._2) } // latest = highest n_events
      assert(latest(10L) === ((10L, 3L, 4.0, 30L)), s"user 10 profile wrong: ${latest(10L)}")
      assert(latest(20L) === ((20L, 1L, 4.0, 7L)), s"user 20 profile wrong: ${latest(20L)}")
    } finally query.stop()
  }

  test("transformWithState TTL mode emits profiles (self-triggering query)") {
    // the production configuration (state TTL ⇒ TimeMode.ProcessingTime):
    // the query self-triggers micro-batches to service evictions, so it
    // never idles — poll for the data batch's emission, then stop.
    val s2 = spark.newSession()
    s2.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sql = s2.sqlContext
    import s2.implicits._
    val source = MemoryStream[Event]
    source.addData(Event(1L, ts(5), 10L, 1.00), Event(2L, ts(6), 10L, 2.00))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val query = EventStreams
      .userProfiles(source.toDS(), ttl = Some(java.time.Duration.ofHours(1)))
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.UserProfile], _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(p => (p.user_id, p.n_events, p.total_value))
        }
        ()
      }
      .start()
    try {
      val deadline = System.nanoTime() + 120e9.toLong
      while (got.synchronized(got.isEmpty) && System.nanoTime() < deadline) Thread.sleep(200)
      val latest = got.synchronized(got.toSeq).groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(latest.get(10L).contains((10L, 2L, 3.0)), s"TTL-mode profile wrong: $latest")
    } finally query.stop()
  }

  test("sessionize emits a session once the inactivity gap elapses") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Event]
    val query = sessionize(source.toDS()).writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap →
      // third event closes session 1. Timestamps are based well above epoch 0:
      // a row sitting exactly AT the initial watermark is treated as late and
      // silently dropped (see the dedup test above).
      val base = 1700000000000L
      def t2(min: Long) = new Timestamp(base + min * 60_000L)
      source.addData(
        Event(1, t2(0), 1, 1.0),
        Event(2, t2(10), 1, 2.0))
      query.processAllAvailable()
      source.addData(Event(3, t2(50), 1, 7.0))
      query.processAllAvailable()
      val sessions = spark.table("session_test").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - base) / 60000, r.getLong(2), r.getDouble(3)))
      assert(sessions.toSet === Set((1L, 0L, 2L, 3.0)))
    } finally query.stop()
  }

  test("built-in session_window stream agrees with the custom-state sessionizer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = 1700000000000L
    def t2(min: Long) = new Timestamp(base + min * 60_000L)
    val source = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.sessionizeBuiltin(df).writeStream
      .format("memory")
      .queryName("session_builtin_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // same scenario as the custom-state test: two events 10 min apart,
      // then a 40-min gap — the first session must close identically
      source.addData(
        (1L, t2(0), 1L, "click", 1.0),
        (2L, t2(10), 1L, "click", 2.0))
      query.processAllAvailable()
      source.addData((3L, t2(50), 1L, "click", 7.0))
      query.processAllAvailable()
      source.addData((4L, t2(200), 2L, "click", 0.0)) // advance watermark → flush
      query.processAllAvailable()
      val sessions = spark.table("session_builtin_test").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - base) / 60000,
          r.getLong(2), r.getDouble(3))).toSet
      assert(sessions.contains((1L, 0L, 2L, 3.0)),
        s"first session (user 1, start 0, 2 events, 3.0) missing: $sessions")
      assert(sessions.contains((1L, 50L, 1L, 7.0)),
        s"second session (user 1, start 50, 1 event, 7.0) missing: $sessions")
    } finally query.stop()
  }

  test("sessionize flushes a user's final session via event-time timeout") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val base = 1700000000000L
    def t2(min: Long) = new Timestamp(base + min * 60_000L)
    val source = MemoryStream[Event]
    val query = sessionize(source.toDS(), watermarkDelay = "10 minutes").writeStream
      .format("memory")
      .queryName("session_timeout_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1 goes quiet after one event; only OTHER users' events advance
      // the watermark past user 1's gap deadline → the state times out and
      // the final session must emit without any further user-1 event.
      source.addData(Event(1, t2(0), 1, 1.0))
      query.processAllAvailable()
      source.addData(Event(2, t2(120), 2, 5.0)) // advances watermark to +110min
      query.processAllAvailable()
      source.addData(Event(3, t2(121), 2, 1.0)) // next batch processes timeouts
      query.processAllAvailable()
      val sessions = spark.table("session_timeout_test").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - base) / 60000, r.getLong(2), r.getDouble(3)))
      assert(sessions.toSet.contains((1L, 0L, 1L, 1.0)),
        s"final session for user 1 not flushed; got ${sessions.toSet}")
    } finally query.stop()
  }

  test("checkpointed sessionizer recovers in-flight session state across a restart") {
    // The harder state-store story than dedup recovery (above): an OPEN
    // session must survive a stop/start — a post-restart event within the
    // gap must MERGE into the recovered session (not start a second one),
    // pre-restart emissions must not re-emit, and no session may be lost.
    import org.apache.spark.sql.types._
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft-sess-src-").toString
    val sinkDir = Files.createTempDirectory("graft-sess-sink-").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt-").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val base = 1700000000000L
    def t2(min: Long) = new Timestamp(base + min * 60_000L)
    def writeEvents(rows: (Long, Long, Long, Double)*): Unit = {
      import spark.implicits._
      rows.toSeq.map { case (id, min, uid, v) => (id, t2(min), uid, v) }
        .toDF("event_id", "ts", "user_id", "value").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    def runOnce(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(schema).parquet(srcDir).as[Event]
      val q = sessionize(stream).writeStream
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // Phase 1: user 1's session closes pre-restart (watermark pushed past
    // its deadline by user 99's event); user 99's session stays OPEN.
    // (both files land in ONE batch — the timeout actually fires in the
    // post-watermark no-data micro-batch, on by default)
    writeEvents((1L, 0L, 1L, 1.0), (2L, 10L, 1L, 2.0), (3L, 120L, 99L, 5.0))
    writeEvents((4L, 121L, 99L, 1.0))
    runOnce()
    // Phase 2 (restart): event 5 falls within user 99's gap → must merge
    // into the RECOVERED session; user 98's later events push the
    // watermark past its deadline so the merged session flushes.
    writeEvents((5L, 130L, 99L, 3.0), (6L, 300L, 98L, 7.0))
    writeEvents((7L, 301L, 98L, 1.0))
    runOnce()
    val sessions = spark.read.parquet(sinkDir).collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - base) / 60000, r.getLong(2), r.getDouble(3)))
      .toSeq
    val u1 = sessions.filter(_._1 == 1L)
    val u99 = sessions.filter(_._1 == 99L)
    assert(u1 === Seq((1L, 0L, 2L, 3.0)),
      s"pre-restart session duplicated or lost: $u1")
    assert(u99 === Seq((99L, 120L, 3L, 9.0)),
      s"in-flight session not merged across restart: $u99")
  }

  test("streaming DSIR gate admits target-vocabulary docs with a fit-offline vote map") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // fit offline on a planted two-vocabulary corpus (target = vocab A)
    def doc(id: Long, vocab: Seq[String]): (Long, String, Boolean) = {
      val words = (0 until 40).map(k => vocab(((id + k) % vocab.size).toInt))
      (id, words.mkString(" "), id < 50)
    }
    val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val vocabB = Seq("uno", "dos", "tres", "cuatro", "cinco", "seis")
    val fitDocs =
      ((0L until 50L).map(doc(_, vocabA)) ++ (50L until 100L).map(doc(_, vocabB)))
        .toDF("doc_id", "text", "is_a")
    val votes = graft.operators.Sampling.dsirVoteMap(fitDocs, col("is_a"))
    // serve online: stream unseen docs (fresh ids, same vocabularies)
    val source = MemoryStream[(Long, String)]
    val stream = source.toDF().toDF("doc_id", "text")
    val query = StreamingDedup.dsirAdmit(stream, votes).writeStream
      .format("memory")
      .queryName("dsir_gate_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val newA = (100L until 110L).map(doc(_, vocabA)).map(d => (d._1, d._2))
      val newB = (110L until 120L).map(doc(_, vocabB)).map(d => (d._1, d._2))
      source.addData(newA ++ newB: _*)
      query.processAllAvailable()
      val admitted = spark.table("dsir_gate_test").collect().map(_.getLong(0)).toSet
      assert(admitted === (100L until 110L).toSet,
        s"gate admitted $admitted — want exactly the vocab-A stream docs")
      // the stream gate must agree with the batch scorer doc-for-doc
      val batchDocs = (newA ++ newB).toDF("doc_id", "text")
      val batchAdmitted = StreamingDedup.dsirAdmit(batchDocs, votes)
        .collect().map(_.getLong(0)).toSet
      assert(batchAdmitted === admitted)
    } finally query.stop()
  }

  test("quotaAdmit caps per-user hourly admissions, counter survives across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // hour-aligned base so all minute offsets < 60 share one quota bucket
    val base = 1700000000000L - (1700000000000L % 3600000L)
    def t2(min: Long) = new Timestamp(base + min * 60_000L)
    val source = MemoryStream[Event]
    val query = quotaAdmit(source.toDS(), perHour = 3).writeStream
      .format("memory")
      .queryName("quota_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 fires 5 events in the hour (2 over quota), user 2 fires 2
      val b1 = Seq(
        Event(1, t2(1), 1, 1.0), Event(2, t2(2), 1, 1.0), Event(3, t2(3), 1, 1.0),
        Event(4, t2(4), 1, 1.0), Event(5, t2(5), 1, 1.0),
        Event(6, t2(1), 2, 1.0), Event(7, t2(2), 2, 1.0))
      source.addData(b1: _*)
      query.processAllAvailable()
      def decisions() = spark.table("quota_test").collect()
        .map(r => (r.getLong(2), r.getBoolean(3))).toMap // event_id -> admitted
      val d1 = decisions()
      assert(d1.filter(_._2).keySet === Set(1L, 2L, 3L, 6L, 7L),
        s"single-batch admissions wrong: $d1")
      // the single-batch decisions must equal the batch-replay rank rule
      import org.apache.spark.sql.functions.col
      val replay = b1.toDF()
        .withColumn("hr", org.apache.spark.sql.functions.date_trunc("hour", col("ts")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id", "hr").orderBy("ts", "event_id")))
        .select(col("event_id"), (col("rn") <= 3).as("admitted"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(replay === d1, "stream decisions diverge from batch replay")
      // batch 2, same hour: the carried counter rejects both extra events
      source.addData(Event(8, t2(10), 1, 1.0), Event(9, t2(11), 1, 1.0))
      query.processAllAvailable()
      val d2 = decisions()
      assert(!d2(8L) && !d2(9L), s"same-hour batch-2 events not rejected: $d2")
      // next hour: a fresh key admits again
      source.addData(Event(10, t2(61), 1, 1.0))
      query.processAllAvailable()
      assert(decisions()(10L), "new hour should reset the quota")
    } finally query.stop()
  }

  test("stream-static as-of enrichment picks each event's covering dimension version") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // SCD-2-shaped dimension: user 1 upgrades bronze→gold at minute 60;
    // user 2 has one open-ended version; user 3 is unknown to the dim
    val dim = Seq(
      (1L, ts(0), ts(60), "bronze"),
      (1L, ts(60), new Timestamp(Long.MaxValue / 1000), "gold"),
      (2L, ts(30), new Timestamp(Long.MaxValue / 1000), "silver"))
      .toDF("user_id", "valid_from", "valid_to", "tier")
    val source = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventStreams.enrichAsOf(events, dim)
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("asof_enrich_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val batch = Seq(
        (1L, ts(10), 1L, "click", 1.0), // bronze era
        (2L, ts(59), 1L, "click", 1.0), // last bronze minute
        (3L, ts(60), 1L, "click", 1.0), // boundary: gold from minute 60
        (4L, ts(90), 1L, "click", 1.0), // gold era
        (5L, ts(45), 2L, "click", 1.0), // silver
        (6L, ts(10), 2L, "click", 1.0), // BEFORE user 2's first version → dropped
        (7L, ts(10), 3L, "click", 1.0)) // unknown key → dropped
      source.addData(batch: _*)
      query.processAllAvailable()
      val got = spark.table("asof_enrich_test").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "bronze", 2L -> "bronze", 3L -> "gold",
        4L -> "gold", 5L -> "silver"))
      // agreement with the batch form of the same join
      val want = EventStreams.enrichAsOf(
        batch.toDF("event_id", "ts", "user_id", "event_type", "value"), dim)
        .select(col("event_id"), col("tier")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === want, "stream enrichment diverges from the batch twin")
    } finally query.stop()
  }
}
