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
