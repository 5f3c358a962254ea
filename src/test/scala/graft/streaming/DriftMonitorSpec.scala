package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** The drift monitor's contract: a reference-proportional batch stays
  * quiet, a drifted batch alarms with the hand-computable exact TVD, a
  * replayed batch id is a no-op (at-least-once safety), an empty batch
  * leaves a distinguishable quiet row, and the end-to-end stream audits
  * every micro-batch exactly once. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val Ref = Seq(("view", 60L), ("click", 30L), ("error", 10L))

  private def freshTable(name: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete()
    }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (dir.exists) rm(dir)
  }

  private def audit(table: String): Map[Long, (Long, Option[Long], Long)] = {
    spark.catalog.refreshTable(table)
    spark.table(table).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_batch"),
          Option(r.getAs[java.lang.Long]("tvd_ppm")).map(_.longValue),
          r.getAs[Long]("alarm")))
      .toMap
  }

  test("drift audit: proportional quiet, drift alarms at the exact TVD, replay no-op, empty row") {
    val table = "graft_drift_audit"
    freshTable(table)
    val ref = Ref.toDF("bin", "c")
    // batch 0: the reference mix at 1/5 mass — TVD must be exactly 0
    val b0 = (Seq.fill(12)("view") ++ Seq.fill(6)("click") ++ Seq.fill(2)("error"))
      .toDF("bin")
    DriftMonitor.applyBatch(spark, ref, table, b0, 0L, 100000L)
    // batch 1: pure error burst. Hand TVD: Σ|c_b·n_ref − c_ref·n_b| =
    // |0−1200| + |0−600| + |2000−200| = 3600 → 3600·10⁶/(2·20·100) = 900000
    val b1 = Seq.fill(20)("error").toDF("bin")
    DriftMonitor.applyBatch(spark, ref, table, b1, 1L, 100000L)
    // replay of batch 1 with DIFFERENT (poisoned) content: must be a no-op
    DriftMonitor.applyBatch(spark, ref, table, b0, 1L, 100000L)
    // batch 2: empty — audited as quiet-but-present
    DriftMonitor.applyBatch(
      spark, ref, table, Seq.empty[String].toDF("bin"), 2L, 100000L)
    val got = audit(table)
    assert(got.size === 3, "exactly one audit row per batch id")
    assert(got(0L) === ((20L, Some(0L), 0L)))
    assert(got(1L) === ((20L, Some(900000L), 1L)))
    assert(got(2L) === ((0L, None, 0L)))
  }

  test("drift monitor end-to-end: every file-source micro-batch audited exactly once") {
    val table = "graft_drift_e2e"
    freshTable(table)
    val src = Files.createTempDirectory("graft-drift-src-").toString
    val ckpt = Files.createTempDirectory("graft-drift-ck-").toString
    // single part file each: maxFilesPerTrigger=1 must see one FILE per
    // logical batch, not one per shuffle partition
    (Seq.fill(6)("view") ++ Seq.fill(3)("click") ++ Seq.fill(1)("error"))
      .toDF("bin").coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/f0")
    Seq.fill(10)("error").toDF("bin")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$src/f1")
    val stream = spark.readStream
      .schema("bin STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val q = DriftMonitor.monitorStream(
      stream, Ref.toDF("bin", "c"), table, ckpt, 100000L)
    q.processAllAvailable()
    q.stop()
    val got = audit(table)
    assert(got.values.map(_._1).sum === 20L, "both files' rows audited")
    assert(got.values.count(_._3 == 1L) === 1, "exactly one alarmed batch")
    assert(got.values.exists(v => v._2 === Some(0L) && v._3 === 0L),
      "the proportional batch is quiet with TVD 0")
  }
}
