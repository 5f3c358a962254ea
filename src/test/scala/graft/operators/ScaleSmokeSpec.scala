package graft.operators

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-linearity smoke: run the SAME query code over a 10×-replicated
  * copy of the input and require the exact algebraic relationship to the
  * 1× results. This catches a class of bug the fixed-size oracle can't:
  * anything whose correctness quietly depends on the test volume (an
  * accumulator overflowing, a partial aggregate path skipped, a broadcast
  * that only works because the data is small). Counts must scale
  * STRICTLY exactly; money values are integer-exact inside the query and
  * compared within a couple of ulps (the final /100 and the test's ×rep
  * are double ops with their own rounding). */
class ScaleSmokeSpec extends SparkSpec {

  test("q1 aggregates are exactly linear under 10x replicated input") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-").toString
    Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(rep)) // every row 10×
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    val base = Relational.q1Pricing(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val scaled = Relational.q1Pricing(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(scaled.keySet === base.keySet)

    // Sums are integer-exact INSIDE the query; the final /100 and the
    // test's own ×rep happen in doubles, so the comparison allows one
    // part in 1e12 (a couple of ulps) — counts stay strictly exact.
    def close(a: Double, b: Double, what: String): Unit =
      assert(math.abs(a - b) <= math.abs(b) * 1e-12, s"$what: $a vs $b")
    base.foreach { case (k, b) =>
      val s10 = scaled(k)
      close(s10.getDouble(2), b.getDouble(2) * rep, s"$k sum_qty")
      close(s10.getDouble(3), b.getDouble(3) * rep, s"$k sum_base_price")
      close(s10.getDouble(4), b.getDouble(4) * rep, s"$k sum_disc_price")
      close(s10.getDouble(5), b.getDouble(5) * rep, s"$k sum_charge")
      assert(s10.getLong(9) === b.getLong(9) * rep, s"$k count_order")
      // intensive averages are volume-invariant
      close(s10.getDouble(6), b.getDouble(6), s"$k avg_qty")
      close(s10.getDouble(7), b.getDouble(7), s"$k avg_price")
      close(s10.getDouble(8), b.getDouble(8), s"$k avg_disc")
    }
  }

  test("BPE pair counts are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-bpe-").toString
    // distinct doc_ids per replica (the pair statistic ignores doc_id, but
    // keep the table well-formed)
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = TextOps.qBpePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val scaled = TextOps.qBpePairs(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // ×rep preserves both every count and the (cnt desc, pair) order, so
    // the top-30 must be the same pairs in the same positions
    assert(scaled === base.map { case (p, c) => (p, c * rep) })
  }

  test("sequence packing totals are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-pack-").toString
    // replica k appends AFTER the original in doc_id order → each source's
    // token stream is rep concatenated copies; totals must scale exactly
    // and the bin count per source is ceil(rep·T_s / cap), computable from
    // the 1x totals
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cap = 512L
    // independent expectation: per-source doc token lengths in doc_id
    // order, concatenated rep times; a bin exists iff some doc STARTS in
    // it (bin = floor(tokens-before / cap))
    val baseLens = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.sortBy(_._2).map(_._3) }
    val expected = baseLens.map { case (src, lens) =>
      val stream = Seq.fill(rep)(lens).flatten
      val starts = stream.scanLeft(0L)(_ + _).dropRight(1)
      src -> (stream.sum, starts.map(_ / cap).distinct.length.toLong)
    }
    val scaled = Sampling.qPackSequences(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    val scaledTok = scaled.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val scaledBins = scaled.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    expected.foreach { case (src, (tokTotal, bins)) =>
      assert(scaledTok(src) === tokTotal, s"$src token total not linear")
      assert(scaledBins(src) === bins, s"$src bin count disagrees with recomputation")
    }
  }

  test("chunking is content-pure: 10x replicas chunk identically") {
    // chunk boundaries and hashes depend ONLY on the document text, so a
    // replica must chunk exactly like its original — the append-stability
    // claim (re-chunking a grown corpus never moves an existing chunk) as
    // an executable property
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-chunk-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rows(d: String) = TextOps.qChunkWindows(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val base = rows(sfDir).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq.sorted }
    val scaled = rows(tmp)
    assert(scaled.length === base.values.map(_.size).sum * rep)
    scaled.groupBy(_._1).foreach { case (id, v) =>
      assert(v.map(_._2).toSeq.sorted === base(id % 1000000L), s"doc $id chunks moved")
    }
  }

  test("DSIR votes are invariant under 10x corpus replication") {
    // exact replication scales every bucket count and both totals by rep,
    // so each cross-multiplied share comparison scales by rep² on both
    // sides — identical votes, identical scores, identical admissions.
    // Catches any drift toward volume-dependent scoring (absolute-count
    // thresholds, un-normalized smoothing).
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-dsir-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rows(d: String) = Sampling.qDsirScore(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val base = rows(sfDir).toMap
    val scaled = rows(tmp)
    assert(scaled.length === base.size * rep)
    scaled.foreach { case (id, v) =>
      assert(v === base(id % 1000000L), s"doc $id score changed under replication")
    }
  }

  test("wordcount counts are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-doc-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = TextOps.qWordcount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val scaled = TextOps.qWordcount(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scaled === base.map { case (w, n) => w -> n * rep })
  }
}
