package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
import scala.jdk.CollectionConverters._

/** Scratch diagnostic main (not part of the driver contract): reruns the
  * named queries many times in one session and prints per-attempt exec
  * seconds next to JVM/session state (GC time delta, persistent-RDD
  * count, shuffle count) — for chasing monotonic slowdowns across
  * attempts that per-query plan audits cannot see. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val attempts = sys.env.getOrElse("SPARK_GRAFT_DIAG_ATTEMPTS", "6").toInt
    val gcBetween = sys.env.contains("SPARK_GRAFT_DIAG_GC")
    val unpersistBetween = sys.env.contains("SPARK_GRAFT_DIAG_UNPERSIST")
    def gcMillis: Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    // SPARK_GRAFT_DIAG_WARM_N: run the first N headline queries once
    // (noop sink, caches cleared after each) BEFORE timing the named
    // queries — reproduces "query #150 of a bench pass" session state so
    // an in-bench-only slowdown can be bisected to the session age that
    // causes it.
    val warmN = sys.env.getOrElse("SPARK_GRAFT_DIAG_WARM_N", "0").toInt
    if (warmN > 0) {
      val tw0 = System.nanoTime()
      for (q <- SparkEntry.headline.take(warmN)) {
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"[diag] warm ${q.name} failed: $e") }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      println(f"[diag] warmed $warmN queries in ${(System.nanoTime() - tw0) / 1e9}%.1f s")
    }
    def memLine: String = {
      val rt = Runtime.getRuntime
      val bm = org.apache.spark.SparkEnv.get.blockManager
      val st = bm.master.getMemoryStatus.values.headOption
        .map { case (max, rem) => s"storageUsed ${(max - rem) / 1024 / 1024} MB" }
        .getOrElse("storage n/a")
      s"heapUsed ${(rt.totalMemory - rt.freeMemory) / 1024 / 1024} MB, $st"
    }
    val names = args.toSeq
    println(s"[diag] session state: $memLine")
    for (name <- names; a <- 1 to attempts) {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val rdds = spark.sparkContext.getPersistentRDDs
      println(f"[diag] $name attempt $a: build ${(t1 - t0) / 1e9}%.3f s, " +
        f"exec ${(t2 - t1) / 1e9}%.3f s, gc +${gcMillis - gc0} ms, " +
        f"persistentRDDs ${rdds.size}")
      spark.catalog.clearCache()
      if (unpersistBetween)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (gcBetween) System.gc()
    }
    spark.stop()
  }
}
