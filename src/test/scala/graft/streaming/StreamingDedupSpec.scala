package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Incremental against-corpus near-dedup: a static corpus is indexed once;
  * streamed documents are flagged iff they near-duplicate a corpus doc. */
class StreamingDedupSpec extends SparkSpec {

  test("streamed near-dup of a corpus doc is flagged; novel doc passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "completely unrelated corpus text about distributed query engines and shuffles"))
      .toDF("doc_id", "text")

    val source = MemoryStream[(Long, Timestamp, String)]
    val stream = source.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingDedup.minhashAgainstCorpus(stream, corpus).writeStream
      .format("memory")
      .queryName("sdedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      source.addData(
        // near-dup of corpus 100: one word changed → high trigram Jaccard
        (1L, t2(0), "the quick brown fox jumps over the lazy cat near the river bank"),
        // novel document: shares no trigram with the corpus
        (2L, t2(1), "a totally fresh document with brand new content and original phrasing today"))
      query.processAllAvailable()
      val flagged = spark.table("sdedup_test").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(flagged.contains((1L, 100L)),
        s"near-dup of corpus doc 100 not flagged; got $flagged")
      assert(!flagged.exists(_._1 == 2L), s"novel doc falsely flagged: $flagged")

      // cross-batch pair-dedup state: the SAME (new_id, corpus_id) pair
      // recurring in a later batch inside the watermark must report once —
      // re-send doc 1 itself, plus a fresh near-dup doc 3
      source.addData(
        (1L, t2(2), "the quick brown fox jumps over the lazy cat near the river bank"),
        (3L, t2(2), "the quick brown fox jumps over the lazy cat near the river bank"))
      query.processAllAvailable()
      val all = spark.table("sdedup_test").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(all.count(_ == (1L, 100L)) === 1,
        s"pair (1,100) reported more than once across batches: ${all.toSeq}")
      assert(all.toSet.contains((3L, 100L)), "second near-dup doc not flagged")
    } finally query.stop()
  }

  test("streamed image replica is admitted-as-dup against the corpus; distant image passes") {
    import graft.operators.Multimodal
    implicit val sql = spark.sqlContext
    import spark.implicits._

    val corpusIds = (0L until 50L).toSeq
    val corpus = corpusIds.map(id => (id, Multimodal.PngCodec.encode(id))).toDF("doc_id", "blob")

    // formula-direct corpus dhashes (no codec) to PLANT a distant image:
    // an id whose hash is > 2 bits from every corpus hash
    def dhashOf(id: Long): Long = {
      val w = (id % 48 + 32).toInt; val h = (id % 32 + 24).toInt
      var v = 0L
      for (j <- 0 until 8; i <- 0 until 7) {
        val sy = j * h / 8
        val p0 = ((i * w / 8) * 7L + sy * 13L + id * 31L) % 256L
        val p1 = (((i + 1) * w / 8) * 7L + sy * 13L + id * 31L) % 256L
        if (p1 > p0) v |= 1L << (j * 7 + i)
      }
      v
    }
    val corpusHashes = corpusIds.map(dhashOf)
    val farId = (1000L until 3000L)
      .find(id => corpusHashes.forall(h => java.lang.Long.bitCount(h ^ dhashOf(id)) > 2))
      .getOrElse(fail("no distant image id found — fixture assumption broke"))

    val source = MemoryStream[(Long, Timestamp, Array[Byte])]
    val stream = source.toDF().toDF("img_id", "ts", "blob")
    val query = StreamingDedup.dhashAgainstCorpus(stream, corpus).writeStream
      .format("memory")
      .queryName("sdhash_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      source.addData(
        (500L, t2(0), Multimodal.PngCodec.encode(7L)), // byte-replica of corpus image 7
        (501L, t2(1), Multimodal.PngCodec.encode(farId))) // > 2 bits from every corpus hash
      query.processAllAvailable()
      val rows = spark.table("sdhash_test").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      assert(rows.contains((500L, 7L, 0L)),
        s"replica of corpus image 7 not flagged at hamming 0; got ${rows.toSeq}")
      assert(!rows.exists(_._1 == 501L), s"distant image falsely flagged: ${rows.toSeq}")
    } finally query.stop()
  }

  test("streamed embedding near-dup is flagged through the probed IVF cells; " +
    "orthogonal vector passes; unprobed-cell dup is the accepted IVF miss") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    // 2-cell index: centroids = vec_id 0/1 (frozen deterministic sample);
    // corpus 2 lives in cell 0, corpus 3 in cell 1, corpus 4 straddles
    // the boundary on the cell-0 side
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, Seq(0.1f, 0.9f, 0f, 0f)),
      (4L, Seq(0.71f, 0.70f, 0f, 0f)))
      .toDF("vec_id", "v")

    def run(nProbes: Int, name: String): Seq[(Long, Long, Long)] = {
      val source = MemoryStream[(Long, Timestamp, Seq[Float])]
      val stream = source.toDF().toDF("vec_id", "ts", "v")
      val query = StreamingDedup
        .annAgainstIndex(stream, corpus, nCells = 2, nProbes = nProbes)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
        source.addData(
          (100L, t2(0), Seq(0.9f, 0.1f, 0f, 0f)),   // replica of corpus 2 (cell 0)
          (101L, t2(1), Seq(0f, 0f, 1f, 0f)),       // orthogonal — admit
          (102L, t2(2), Seq(0.70f, 0.71f, 0f, 0f))) // near-dup of 4, routes to cell 1
        query.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      } finally query.stop()
    }

    val p1 = run(1, "sann_p1")
    assert(p1.contains((100L, 2L, 1000000L)),
      s"replica of corpus 2 not flagged in its probed cell; got $p1")
    assert(!p1.exists(_._1 == 101L), s"orthogonal vector falsely flagged: $p1")
    // the IVF contract: 102's true near-dup (corpus 4, cos ≈ 0.9999) sits
    // in cell 0, but 102 routes to cell 1 — with nProbes=1 it is MISSED
    assert(!p1.exists(p => p._1 == 102L && p._2 == 4L),
      s"nProbes=1 should not reach the unprobed cell: $p1")
    // widening the probe set recovers it — recall is a routing budget
    val p2 = run(2, "sann_p2")
    assert(p2.exists(p => p._1 == 102L && p._2 == 4L && p._3 >= 999000L),
      s"nProbes=2 did not recover the boundary near-dup: $p2")
  }

  test("streamed revision sharing a span with the corpus is flagged via CDC chunks; novel doc passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    // deterministic pseudo-text (same LCG device as the kernel specs)
    def lcgText(n: Int, seed: Long): String = {
      val sb = new StringBuilder
      var x = seed
      val alpha = "abcdefghij klmnopqrstuvwxyz"
      for (_ <- 0 until n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(alpha(((x >>> 33) % alpha.length).toInt))
      }
      sb.toString
    }
    val shared = lcgText(600, 77)
    val corpus = Seq((500L, shared), (501L, lcgText(600, 88))).toDF("doc_id", "text")

    val source = MemoryStream[(Long, Timestamp, String)]
    val stream = source.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingDedup.cdcAgainstCorpus(stream, corpus).writeStream
      .format("memory")
      .queryName("scdc_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t2(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      source.addData(
        // a REVISION: new intro, but the tail 400 chars are a corpus span —
        // CDC re-syncs inside the shared region, so its chunk keys match
        (1L, t2(0), "COMPLETELY NEW INTRO PARAGRAPH " + shared.substring(200)),
        // novel document: no shared span, no chunk-key matches
        (2L, t2(1), lcgText(600, 99)))
      query.processAllAvailable()
      val rows = spark.table("scdc_test").collect()
        .map(r => (r.getLong(0), r.getLong(4)))
      assert(rows.contains((1L, 500L)),
        s"revision sharing a 400-char corpus span not flagged; got ${rows.toSeq}")
      assert(!rows.exists(_._1 == 2L), s"novel doc falsely flagged: ${rows.toSeq}")
    } finally query.stop()
  }
}
