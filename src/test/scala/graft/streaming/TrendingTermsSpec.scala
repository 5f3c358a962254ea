package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** The trending-terms state contract: batch-sliced merging equals the
  * one-shot summary in the capacity regime, the MG invariants hold over
  * batches in the over-capacity regime, a replayed batch id is a no-op,
  * and the end-to-end stream maintains the stored summary exactly
  * once per batch. */
class TrendingTermsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTables(name: String): Unit = freshVersionedTables(name, 10)

  test("capacity regime: batch-sliced merges equal exact counts; replay is a no-op") {
    val table = "graft_trending_cap"
    freshTables(table)
    // 8 distinct terms under k=20: every batch summary and every merge is
    // exact, so the stored state must equal the exact frequency map no
    // matter how the stream was sliced
    val b0 = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq.fill(1)("gamma")
    val b1 = Seq.fill(4)("beta") ++ Seq.fill(2)("delta")
    val b2 = Seq.fill(7)("alpha") ++ Seq.fill(1)("gamma")
    TrendingTerms.applyBatch(spark, table, b0.toDF("term"), 0L, 20)
    TrendingTerms.applyBatch(spark, table, b1.toDF("term"), 1L, 20)
    // replay batch 1 with poisoned content — must not double-merge
    TrendingTerms.applyBatch(spark, table, Seq.fill(100)("poison").toDF("term"), 1L, 20)
    TrendingTerms.applyBatch(spark, table, b2.toDF("term"), 2L, 20)
    val truth = (b0 ++ b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(TrendingTerms.storedSummary(spark, table) === truth)
  }

  test("over-capacity: invariants hold across batches and the heavy term survives") {
    val table = "graft_trending_over"
    freshTables(table)
    val k = 10
    // three batches, 60 distinct tail terms + one heavy: n = 360,
    // f(hot) = 120 > n/(k+1) = 32.7 → guaranteed retained with
    // est ≥ 120 − 32 = 88
    val batches = (0 until 3).map { b =>
      Seq.fill(40)("hot") ++ (0 until 80).map(i => f"t${b * 80 + i}%03d")
    }
    val truth = batches.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = batches.map(_.size).sum.toLong
    batches.zipWithIndex.foreach { case (items, i) =>
      TrendingTerms.applyBatch(spark, table, items.toDF("term"), i.toLong, k)
    }
    val got = TrendingTerms.storedSummary(spark, table)
    assert(got.size <= k)
    got.foreach { case (t, e) =>
      assert(e <= truth(t), s"$t over-estimated")
      assert((truth(t) - e) * (k + 1) <= n, s"$t under-read past n/(k+1)")
    }
    assert(got.contains("hot"), "guaranteed-heavy term evicted across batch merges")
    assert(got("hot") >= 120L - n / (k + 1), "hot estimate below the guarantee floor")
  }

  test("crash window: version written, marker not — reads stay on the committed " +
    "base and a replay recomputes rather than double-merges") {
    val table = "graft_trending_crash"
    freshTables(table)
    val b0 = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta")
    val b1 = Seq.fill(4)("beta") ++ Seq.fill(2)("gamma")
    TrendingTerms.applyBatch(spark, table, b0.toDF("term"), 0L, 20)
    // the crash BETWEEN the version write and the marker append: the v1
    // snapshot exists on disk, but the marker still names batch 0
    TrendingTerms.writeVersion(spark, table, b1.toDF("term"), 1L, 20)
    // reads during the window resolve the COMMITTED version, not the orphan
    val base = b0.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(TrendingTerms.storedSummary(spark, table) === base)
    // the at-least-once replay of batch 1 recomputes v1 from the committed
    // base — the effect is exactly once, never a double-merge of b1
    TrendingTerms.applyBatch(spark, table, b1.toDF("term"), 1L, 20)
    val truth = (b0 ++ b1).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(TrendingTerms.storedSummary(spark, table) === truth)
  }

  test("end-to-end stream maintains the summary once per file-batch") {
    val table = "graft_trending_e2e"
    freshTables(table)
    val src = Files.createTempDirectory("graft-trend-src-").toString
    val ckpt = Files.createTempDirectory("graft-trend-ck-").toString
    (Seq.fill(6)("x") ++ Seq.fill(2)("y")).toDF("term")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/f0")
    (Seq.fill(3)("y") ++ Seq.fill(1)("z")).toDF("term")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/f1")
    val stream = spark.readStream
      .schema("term STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val q = TrendingTerms.trendingStream(stream, table, ckpt, 20)
    q.processAllAvailable()
    q.stop()
    assert(TrendingTerms.storedSummary(spark, table) ===
      Map("x" -> 6L, "y" -> 5L, "z" -> 1L))
  }
}
