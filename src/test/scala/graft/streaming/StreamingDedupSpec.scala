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
}
