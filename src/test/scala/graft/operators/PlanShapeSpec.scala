package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-plan regression guards: the scale claims in README are plan
  * properties, so pin them — a refactor that silently un-pushes a filter,
  * drops a broadcast, or turns top-k into a global sort fails here, not in
  * a 100 TB run. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q1: filter is pushed to the parquet scan and aggregation is two-phase") {
    val p = plan(Relational.q1Pricing(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$p")
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
    // column pruning: o_orderpriority etc. never read
    assert(!p.contains("l_orderkey"), s"unused column not pruned:\n$p")
  }

  test("q5: dimension joins are broadcast") {
    val p = plan(Relational.q5RegionRevenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.qTopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"top-k became a sort:\n$p")
  }

  test("as-of join compiles to window-over-union with no join operator") {
    val p = plan(TemporalJoins.qAsOfJoin(spark, sfDir))
    assert(p.contains("Window"), s"no window in as-of plan:\n$p")
    assert(!p.contains("Join"), s"as-of should not contain a join:\n$p")
  }

  test("wordcount keeps the native tokenizer inside a single scan stage") {
    val p = plan(TextOps.qWordcount(spark, sfDir))
    assert(p.contains("graft_tokens") || p.contains("grafttokens"),
      s"native tokenizer missing from plan:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("bucketed tables co-locate a fact join with no shuffle exchange") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s2.sql("DROP TABLE IF EXISTS orders_b")
    s2.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.orders(s2, sfDir).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.lineitem(s2, sfDir).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = s2.table("lineitem_b")
        .join(s2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val p = joined.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(p).length
      assert(exchangesBeforeAgg === 0, s"bucketed join still shuffles:\n$p")
      assert(joined.collect().map(_.getLong(1)).sum ===
        Tables.lineitem(s2, sfDir).count())
    } finally {
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
