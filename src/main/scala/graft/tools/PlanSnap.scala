package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Scratch main (not part of the driver contract): writes each named
  * query's `.explain("formatted")` output to `plans/<tag>/<name>_<suffix>.txt`
  * under the repo root — the before/after plan evidence the optimization
  * rounds commit. Usage: `runMain graft.tools.PlanSnap r15 before q1 q2 …`.
  * Session mirrors Bench (core count / shuffle partitions from
  * SPARK_GRAFT_CPUS) so the plans are the ones the bench actually runs. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .config("spark.sql.codegen.cache.maxEntries", "24000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.installOptimizations(spark)
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(dir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
