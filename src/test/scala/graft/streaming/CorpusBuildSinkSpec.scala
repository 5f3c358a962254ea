package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming corpus build end to end: admission gate → idempotent
  * graft-kv streaming sink → versioned-snapshot manifest tailing the
  * written files — BOTH legs killed mid-drain and resumed. The drained
  * corpus must be exactly the batch gate's admitted set (exactly-once
  * through the kill), and the resumed manifest must equal a batch
  * rebuild over the written files (the versioned commits neither lost
  * nor double-applied a replayed micro-batch). */
class CorpusBuildSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshTables(name: String): Unit = freshVersionedTables(name)

  test("manifest is invariant to micro-batch slicing (incl. an empty batch)") {
    // the additive versioned merge must make the final manifest a pure
    // function of the drained SET, independent of how the stream was cut
    // into micro-batches — the property that lets maxFilesPerTrigger,
    // admission-control pacing, and kill/resume all commute with the
    // accounting. One slicing includes an EMPTY batch (a trigger that
    // admitted nothing must commit a version identical to its base).
    import spark.implicits._
    val docMeta = (1L to 6L).map(i => (i, if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "source")
    val rows = (1L to 6L).map(i => (i.toString, ("tok " * i.toInt).trim))
    val slicings: Seq[Seq[Seq[(String, String)]]] = Seq(
      Seq(rows),                                   // one big batch
      rows.map(Seq(_)),                            // one doc per batch
      Seq(rows.take(2), Seq.empty, rows.drop(2)))  // uneven + empty middle
    val manifests = slicings.zipWithIndex.map { case (slices, i) =>
      val table = s"graft_vt_slicing_spec_$i"
      freshVersionedTables(table, 10)
      slices.zipWithIndex.foreach { case (slice, b) =>
        CorpusBuildSink.applyManifestBatch(
          spark, table, docMeta, slice.toDF("key", "value"), b.toLong)
      }
      CorpusBuildSink.manifest(spark, table).get
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    }
    assert(manifests.distinct.size === 1,
      s"manifest depends on batch slicing: $manifests")
    assert(manifests.head === Seq(("books", 3L, 9L), ("web", 3L, 12L)))
  }

  test("streaming corpus build: kill/resume both legs; manifest equals batch rebuild") {
    val table = "graft_corpus_manifest_spec"
    freshTables(table)

    // the DSIR gate's fitted model: target prose says "shiny", raw-only
    // dross says "dross" — admitted docs are the ones the BATCH gate
    // admits (the spec compares stream vs batch, not vs a hand guess)
    val fit = Seq(
      (true, "shiny thing of value"), (true, "a shiny keeper document"),
      (false, "dross thing to drop"), (false, "pure dross filler"),
      (false, "shiny thing of value"), (false, "a neutral line"))
      .toDF("tgt", "text")
    val votes = graft.operators.Sampling.dsirVoteMap(fit, col("tgt"))

    // 30-doc backlog, one monotone-named KV file each (doc_id = key)
    val n = 30
    val texts = (0 until n).map { i =>
      if (i % 4 == 0) s"pure dross filler number $i"
      else s"a shiny keeper document number $i with content $i"
    }
    val src = Files.createTempDirectory("graft-corpus-src-")
    (0 until n).foreach { i =>
      Files.write(src.resolve(f"part-$i%05d"),
        s"$i ${texts(i)}".getBytes(StandardCharsets.UTF_8))
    }
    val docMeta = (0 until n).map(i => (i.toLong, Seq("web", "books", "code")(i % 3)))
      .toDF("doc_id", "source")
    val out = Files.createTempDirectory("graft-corpus-out-").toString
    val ckptCorpus = Files.createTempDirectory("graft-corpus-ck1-").toString
    val ckptManifest = Files.createTempDirectory("graft-corpus-ck2-").toString

    // ---- corpus leg: gate → kv sink, killed mid-drain, resumed
    def startCorpus() = {
      val docs = spark.readStream.format("graft-kv")
        .option("maxFilesPerTrigger", 1) // 30 epochs — wide kill window
        .load(src.toString)
        .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
      CorpusBuildSink.corpusStream(
        StreamingDedup.dsirAdmit(docs, votes), out, ckptCorpus)
    }
    def shardCount() = {
      val fs = new java.io.File(out).listFiles()
      if (fs == null) 0
      else fs.count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }
    val q1 = startCorpus()
    // racy by nature — if the drain outruns the kill, the resume leg
    // still pins no-re-ingest (same idiom as the KV loop spec)
    while (q1.isActive && shardCount() < 3) Thread.sleep(50)
    q1.stop(); q1.awaitTermination()
    val q2 = startCorpus()
    q2.awaitTermination()

    // exactly-once content: read-back == the BATCH gate's admitted set
    val batchDocs = (0 until n).map(i => (i.toLong, texts(i))).toDF("doc_id", "text")
    val wantAdmitted = StreamingDedup.dsirAdmit(batchDocs, votes)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(wantAdmitted.nonEmpty && wantAdmitted.size < n,
      s"gate degenerate: ${wantAdmitted.size}/$n admitted — spec can't distinguish")
    val gotCorpus = spark.read.format("graft-kv").load(out)
      .select(col("key").cast("long"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(gotCorpus === wantAdmitted,
      s"corpus not exactly-once across kill/resume: ${gotCorpus.size} vs ${wantAdmitted.size}")

    // ---- manifest leg: tail the written files, killed mid-drain, resumed
    def startManifest() = CorpusBuildSink.manifestStream(
      spark, out, docMeta, table, ckptManifest, maxFilesPerTrigger = 2)
    val m1 = startManifest()
    while (m1.isActive && VersionedTable.committedBatch(spark, table) < 1L)
      Thread.sleep(50)
    m1.stop(); m1.awaitTermination()
    val midCommit = VersionedTable.committedBatch(spark, table)
    val m2 = startManifest()
    m2.awaitTermination()
    assert(VersionedTable.committedBatch(spark, table) >= midCommit)

    // the resumed manifest == a batch rebuild over the written files
    val want = spark.read.format("graft-kv").load(out)
      .select(
        col("key").cast("long").as("doc_id"),
        size(graft.functions.NativeExprs.tokens(col("value"))).cast("long").as("n_tokens"))
      .join(docMeta, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum("n_tokens").as("tokens_kept"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = CorpusBuildSink.manifest(spark, table).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === want, s"manifest != batch rebuild: $got vs $want")

    // a poisoned replay of an already-committed batch id must be a no-op
    CorpusBuildSink.applyManifestBatch(
      spark, table, docMeta,
      Seq(("0", "poison " * 50)).toDF("key", "value"),
      VersionedTable.committedBatch(spark, table))
    val after = CorpusBuildSink.manifest(spark, table).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(after === want, "replayed batch id double-applied into the manifest")

    // a written key with NO metadata (a write bug) must SURFACE as an
    // __unknown__ manifest row, never silently shrink the counts
    CorpusBuildSink.applyManifestBatch(
      spark, table, docMeta,
      Seq(("999999", "stray row from a write bug")).toDF("key", "value"),
      VersionedTable.committedBatch(spark, table) + 1)
    val withStray = CorpusBuildSink.manifest(spark, table).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(withStray.exists(r => r._1 == "__unknown__" && r._2 == 1L),
      s"stray written key did not surface in the manifest: $withStray")
    assert(withStray.filterNot(_._1 == "__unknown__") === want,
      "stray row disturbed the known-source manifest rows")
  }
}
