package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs the headline queries against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * Execution is forced with a noop-format write: every operator runs to
  * completion (unlike count(), which can prune projections), nothing is
  * collected to the driver, and no output files are written.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM warmup outside the timed region: class loading, codegen compiler
    // and parquet reader init otherwise land entirely on the first query.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, sfDir).limit(100).write.format("noop").mode("overwrite").save()
    // best-of-2 per query: the first execution pays JIT/codegen for that
    // query's operators, which otherwise dominates sub-second queries and
    // makes run-to-run totals jitter by 2-3x.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.headline.map { q =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: $e")
            errors(q.name) = e.toString.take(300)
            None
        }
      }
      q.name -> times.minOption
    }
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results
      .map { case (k, v) => jstr(k) + ":" + v.map(t => f"$t%.3f").getOrElse("null") }
      .mkString("{", ",", "}")
    // A failed query contributes NO time (not a truncated partial) and the
    // run exits nonzero — a broken query must fail the round, not quietly
    // deflate the total.
    val total = f"${results.flatMap(_._2).sum}%.3f"
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
