package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Scratch comparison main (not part of the driver contract): diffs the
  * approximate-ANN query outputs against the exact brute-force baseline at
  * the given SF dirs, to establish where output-equality gate rows hold. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.installOptimizations(spark)
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val approxVsExact = Seq(
      "q_sim_ann_lsh" -> "q_sim_topk_exact",
      "q_sim_ivf_kmeans" -> "q_sim_topk_exact",
      "q_sim_pq" -> "q_sim_topk_exact",
      "q_sim_ivfpq" -> "q_sim_topk_exact",
      "q_dedup_embedding_lsh" -> "q_dedup_embedding")
    for (d <- sfs; (a, b) <- approxVsExact) {
      val ra = SparkEntry.queries(a)(spark, d).collect().map(_.toSeq).toSeq
      val rb = SparkEntry.queries(b)(spark, d).collect().map(_.toSeq).toSeq
      val eq = ra == rb
      println(s"[scratch] $d $a vs $b: equal=$eq (${ra.size} vs ${rb.size} rows)" +
        (if (!eq) s"\n  onlyApprox=${(ra.toSet -- rb.toSet).take(5)}\n  onlyExact=${(rb.toSet -- ra.toSet).take(5)}" else ""))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
