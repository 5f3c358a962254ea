package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Scratch main: print the post-AQE executed plan of the named queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.installOptimizations(spark)
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
